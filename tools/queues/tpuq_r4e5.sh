#!/bin/bash
# round-4e5 device queue: launched by runs/q4e/watch_r4e4.sh the moment
# tpuq_r4e4.sh finishes its int8-640 eval (its nano leg uses the
# worker-killing --epochs-per-dispatch 4 and must not run).
# Order: nano accuracy run FIRST (the round's remaining evidence item),
# then bench validation + NMS variant probe (cuttable if the round ends).
set -u
cd /root/repo
exec 9>runs/.device.lock
flock -n 9 || { echo "another queue holds runs/.device.lock; abort" >&2; exit 1; }
mkdir -p runs/q4e
Q=runs/q4e
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*" >> "$Q/queue.log"; }

log "q4e5 queue start (pid $$)"

DATA=runs/data/synth14k_v2.yaml

# ---- 1. nano accuracy run (second model family), epd=1 (the only safe
#         dispatch length), 220 epochs = full cosine anneal in-budget
timeout 10800 python tools/train.py \
    --conf-file yololp_tpu/configs/experiment/yololpn_synth.py \
    --img-size 448 --batch-size 48 --epochs 220 \
    --data-path "$DATA" \
    --cache-device --assigner atss_tal --eval-interval 20 --workers 2 \
    --epochs-per-dispatch 1 --name yololpn_v2_tal \
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

# ---- 2. bench validation on the final protocol code (the driver's
#         round-end bench must not be its first execution)
timeout 3600 python bench.py > "$Q/bench_final.json" 2> "$Q/bench_final.err"
log "bench_final rc=$?"

# ---- 3. NMS variant probe under the trusted protocol
timeout 1800 python tools/bench_nms.py \
    > "$Q/nms_variants.json" 2> "$Q/nms_variants.err"
log "bench_nms rc=$?"

log "q4e5 queue complete"
