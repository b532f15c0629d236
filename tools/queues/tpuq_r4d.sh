#!/bin/bash
# round-4d device queue — serial jobs on the single tunnel chip.
# Launched detached (setsid nohup); pid file runs/tpuq_r4d.pid so the
# bench pause-guard can SIGSTOP us during the driver's measurement.
# NEVER edit this file while it may be running (CLAUDE.md ops notes).
set -u
cd /root/repo
mkdir -p runs/q4d
Q=runs/q4d
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*" >> "$Q/queue.log"; }

log "q4d queue start (pid $$)"

# ---- 1. int8 profile: replay-fixed micro rates + e2e fusion-variant grid
timeout 4500 python tools/profile_int8.py \
    --calib-pt /tmp/yololps_bench_calib.json --iters 20 \
    > "$Q/profile_int8.json" 2> "$Q/profile_int8.err"
log "profile_int8 rc=$?"

# ---- 2. flagship retrain: r3 recipe on the regenerated synth14k_v2,
#         with 20-epoch dispatch chunks to amortize the ~25 s/epoch host
#         turnaround measured in r3 (docs/generalization.md)
timeout 21600 python tools/train.py \
    --conf-file yololp_tpu/configs/experiment/yololps_synth.py \
    --img-size 448 --batch-size 48 --epochs 600 \
    --data-path runs/data/synth14k_v2.yaml \
    --cache-device --assigner atss_tal --eval-interval 20 --workers 2 \
    --epochs-per-dispatch 20 --name yololps_v2_tal \
    > "$Q/train_s.log" 2>&1
log "train yololps rc=$?"

W=runs/train/yololps_v2_tal/weights
CFG=yololp_tpu/configs/experiment/yololps_synth.py
DATA=runs/data/synth14k_v2.yaml

# ---- 3. endpoint evals: best/last @448 (r3 protocol), best @640 (headline)
timeout 3600 python tools/eval.py --weights "$W/best_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 448 --batch-size 48 \
    > "$Q/eval_best448.log" 2>&1
log "eval best448 rc=$?"
timeout 3600 python tools/eval.py --weights "$W/last_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 448 --batch-size 48 \
    > "$Q/eval_last448.log" 2>&1
log "eval last448 rc=$?"
timeout 3600 python tools/eval.py --weights "$W/best_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 640 --batch-size 32 \
    > "$Q/eval_best640.log" 2>&1
log "eval best640 rc=$?"

# ---- 4. PTQ calibration at the trained operating point
timeout 5400 python tools/train.py --conf-file "$CFG" --quant --calib \
    --resume "$W/best_ckpt.msgpack" --name yololps_v2_calib \
    --data-path "$DATA" --img-size 448 --batch-size 48 --workers 2 \
    > "$Q/calib.log" 2>&1
log "calib rc=$?"
CAL=runs/train/yololps_v2_calib/weights/calib_amax.json

# ---- 5. TRUE-int8 evals with the fresh amax (448 + 640)
timeout 3600 python tools/eval.py --weights "$W/best_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 448 --batch-size 48 \
    --int8 --calib-pt "$CAL" > "$Q/eval_int8_448.log" 2>&1
log "eval int8 448 rc=$?"
timeout 3600 python tools/eval.py --weights "$W/best_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 640 --batch-size 32 \
    --int8 --calib-pt "$CAL" > "$Q/eval_int8_640.log" 2>&1
log "eval int8 640 rc=$?"

# ---- 6. nano accuracy run (second model family, VERDICT r3 #4)
timeout 14400 python tools/train.py \
    --conf-file yololp_tpu/configs/experiment/yololpn_synth.py \
    --img-size 448 --batch-size 48 --epochs 600 \
    --data-path "$DATA" \
    --cache-device --assigner atss_tal --eval-interval 20 --workers 2 \
    --epochs-per-dispatch 20 --name yololpn_v2_tal \
    > "$Q/train_n.log" 2>&1
log "train yololpn rc=$?"

WN=runs/train/yololpn_v2_tal/weights
timeout 3600 python tools/eval.py --weights "$WN/best_ckpt.msgpack" \
    --conf-file yololp_tpu/configs/experiment/yololpn_synth.py \
    --data "$DATA" --img-size 448 --batch-size 48 \
    > "$Q/eval_n_best448.log" 2>&1
log "eval nano best448 rc=$?"

log "q4d queue done"
