#!/bin/bash
# int8 e2e attribution ladder at b128@640 with the r5 graph/chain-exit
# handoffs (VERDICT r4 #3 evidence): runs in the stage-6 drain, prefers
# the stage-3 trained-point calib, falls back to the bench's random calib.
cd /root/repo
CAL=runs/train/yololps_v2_calib/weights/calib_amax.json
[ -f "$CAL" ] || CAL=/tmp/yololps_bench_calib.json
[ -f "$CAL" ] || { echo "no calib table available; skip"; exit 0; }
timeout 3000 python tools/probe_int8_e2e.py --calib-pt "$CAL" \
    --iters 10 --skip-chain-micro
