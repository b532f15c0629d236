#!/bin/bash
# round-4e3 device queue: the r4e2 training block, relaunched after the
# 22:39 TPU-worker crash (train epoch 0 ran under full host CPU
# starvation — a pytest suite was running concurrently; epoch time
# ballooned 374 s and the worker then crashed). RULE: nothing CPU-heavy
# runs on this host while this queue is active.
# NEVER edit while running — write a new filename instead.
set -u
cd /root/repo
exec 9>runs/.device.lock
flock -n 9 || { echo "another queue holds runs/.device.lock; abort" >&2; exit 1; }
mkdir -p runs/q4e
Q=runs/q4e
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*" >> "$Q/queue.log"; }

log "q4e3 queue start (pid $$)"

# ---- 3. flagship retrain: r3 recipe on the regenerated synth14k_v2
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

# ---- 6. TRUE-int8 evals with the fresh amax (448 + 640)
timeout 3600 python tools/eval.py --weights "$W/best_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 448 --batch-size 48 \
    --int8 --calib-pt "$CAL" > "$Q/eval_int8_448.log" 2>&1
log "eval int8 448 rc=$?"
timeout 3600 python tools/eval.py --weights "$W/best_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 640 --batch-size 32 \
    --int8 --calib-pt "$CAL" > "$Q/eval_int8_640.log" 2>&1
log "eval int8 640 rc=$?"

# ---- 7. nano accuracy run (second model family, VERDICT r3 #4).
#         400 epochs: full cosine anneal inside the remaining round time.
timeout 12600 python tools/train.py \
    --conf-file yololp_tpu/configs/experiment/yololpn_synth.py \
    --img-size 448 --batch-size 48 --epochs 400 \
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
timeout 3600 python tools/eval.py --weights "$WN/best_ckpt.msgpack" \
    --conf-file yololp_tpu/configs/experiment/yololpn_synth.py \
    --data "$DATA" --img-size 640 --batch-size 32 \
    > "$Q/eval_n_best640.log" 2>&1
log "eval nano best640 rc=$?"

log "q4e3 queue complete"
