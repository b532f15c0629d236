#!/bin/bash
# int8 e2e attribution ladder at b128@640 with the r5 graph/chain-exit
# handoffs (VERDICT r4 #3 evidence): runs in the stage-6 drain, prefers
# the stage-3 trained-point calib, falls back to the bench's random calib.
# Time-gated: the ladder compiles several e2e variants (~20 min on the
# tunnel); skip when it would crowd the 21:55 hard end.
cd /root/repo
NOW=$(date +%s)
GATE=$(date -u -d '2026-08-19 21:25' +%s)
[ "$NOW" -gt "$GATE" ] && { echo "past 21:25 gate; skip"; exit 0; }
CAL=runs/train/yololps_v2_calib/weights/calib_amax.json
[ -f "$CAL" ] || CAL=/tmp/yololps_bench_calib.json
[ -f "$CAL" ] || { echo "no calib table available; skip"; exit 0; }
timeout 1800 python tools/probe_int8_e2e.py --calib-pt "$CAL" \
    --iters 10 --skip-chain-micro
