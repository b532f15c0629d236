#!/bin/bash
# round-4d2 device queue (supersedes tpuq_r4d.sh, killed mid-item-1 to
# front-load the int8 lowering probe; its compiles are in the XLA cache).
# Serial jobs on the single tunnel chip. NEVER edit while running.
set -u
cd /root/repo
mkdir -p runs/q4d
Q=runs/q4d
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*" >> "$Q/queue.log"; }

log "q4d2 queue start (pid $$)"

# ---- 1. MXU int8 rate probe: matmul xla/pallas + conv/9dots, bf16 vs int8
timeout 4500 python tools/probe_mxu_int8.py --iters 20 \
    > "$Q/probe_mxu.json" 2> "$Q/probe_mxu.err"
log "probe_mxu rc=$?"

# ---- 2. int8 profile: replay-fixed micro + e2e fusion grid incl. dots
timeout 5400 python tools/profile_int8.py \
    --calib-pt /tmp/yololps_bench_calib.json --iters 20 \
    > "$Q/profile_int8.json" 2> "$Q/profile_int8.err"
log "profile_int8 rc=$?"

# ---- 3. flagship retrain: r3 recipe on the regenerated synth14k_v2,
#         20-epoch dispatch chunks to amortize the ~25 s/epoch host
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

# ---- 4. endpoint evals: best/last @448 (r3 protocol), best @640 (headline)
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

# ---- 5. PTQ calibration at the trained operating point
timeout 5400 python tools/train.py --conf-file "$CFG" --quant --calib \
    --resume "$W/best_ckpt.msgpack" --name yololps_v2_calib \
    --data-path "$DATA" --img-size 448 --batch-size 48 --workers 2 \
    > "$Q/calib.log" 2>&1
log "calib rc=$?"
CAL=runs/train/yololps_v2_calib/weights/calib_amax.json

# ---- 6. TRUE-int8 evals with the fresh amax (448 + 640, conv vs dots A/B)
timeout 3600 python tools/eval.py --weights "$W/best_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 448 --batch-size 48 \
    --int8 --calib-pt "$CAL" > "$Q/eval_int8_448.log" 2>&1
log "eval int8 448 rc=$?"
timeout 3600 python tools/eval.py --weights "$W/best_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 640 --batch-size 32 \
    --int8 --calib-pt "$CAL" > "$Q/eval_int8_640.log" 2>&1
log "eval int8 640 rc=$?"
timeout 3600 python tools/eval.py --weights "$W/best_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 640 --batch-size 32 \
    --int8 --calib-pt "$CAL" --conv-impl dots \
    > "$Q/eval_int8_640_dots.log" 2>&1
log "eval int8 640 dots rc=$?"

# ---- 7. nano accuracy run (second model family, VERDICT r3 #4)
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

log "q4d2 queue done"
