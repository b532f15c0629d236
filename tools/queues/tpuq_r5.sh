#!/bin/bash
# round-5 device queue: rebuild all device-side evidence after the Aug-19
# sandbox reset wiped runs/ (dataset + every checkpoint). Serial jobs on
# the single tunnel chip; exclusive flock; epd=1 ONLY (the tunnel kills
# dispatches longer than ~60s — see CLAUDE.md Ops notes).
# NEVER edit this file while it may be running — write a new filename.
set -u
cd /root/repo
exec 9>runs/.device.lock
flock -n 9 || { echo "another queue holds runs/.device.lock; abort" >&2; exit 1; }
mkdir -p runs/q5 runs/q5/extra_jobs.d runs/q5/extra_done
Q=runs/q5
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*" >> "$Q/queue.log"; }

log "r5 queue start (pid $$)"

DATA=runs/data/synth14k_v2.yaml
CFG=yololp_tpu/configs/experiment/yololps_synth.py
NCFG=yololp_tpu/configs/experiment/yololpn_synth.py

drain_extras() {
    for j in "$Q"/extra_jobs.d/*.sh; do
        [ -e "$j" ] || continue
        b=$(basename "$j")
        [ -e "$Q/extra_done/$b" ] && continue
        log "extra job $b start"
        timeout 3600 bash "$j" > "$Q/extra_${b%.sh}.log" 2>&1
        log "extra job $b rc=$?"
        touch "$Q/extra_done/$b"
    done
}

# ---- 1. early bench validation (banks a perf record in case the tunnel
#         wedges later; also re-exports the native StableHLO artifacts)
timeout 3600 python bench.py > "$Q/bench_early.json" 2> "$Q/bench_early.err"
log "bench_early rc=$?"

# ---- 2. gated extra-jobs window (train-MFU probe lands here); closes on
#         gate file or 45-min deadline so a lost session can't stall us
DEADLINE=$(( $(date +%s) + 2700 ))
log "extra window open (deadline $(date -u -d @$DEADLINE '+%H:%M:%S'))"
while [ ! -f "$Q/gate_training" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; do
    drain_extras
    sleep 15
done
log "extra window closed (gate=$([ -f $Q/gate_training ] && echo yes || echo deadline))"

# ---- 3. wait for the regenerated dataset (gen_data.log writes the yaml last)
while [ ! -f "$DATA" ]; do sleep 30; done
log "dataset ready"

# ---- 4. flagship retrain: r3 recipe, epd=1
timeout 21600 python tools/train.py \
    --conf-file "$CFG" \
    --img-size 448 --batch-size 48 --epochs 600 \
    --data-path "$DATA" \
    --cache-device --assigner atss_tal --eval-interval 20 --workers 2 \
    --epochs-per-dispatch 1 --name yololps_v2_tal \
    > "$Q/train_s.log" 2>&1
log "train yololps rc=$?"

W=runs/train/yololps_v2_tal/weights

# ---- 5. endpoint evals: best/last @448 (r3 protocol), best @640 (headline)
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

# ---- 6. PTQ calibration at the trained operating point + TRUE-int8 evals
timeout 5400 python tools/train.py --conf-file "$CFG" --quant --calib \
    --resume "$W/best_ckpt.msgpack" --name yololps_v2_calib \
    --data-path "$DATA" --img-size 448 --batch-size 48 --workers 2 \
    > "$Q/calib.log" 2>&1
log "calib rc=$?"
CAL=runs/train/yololps_v2_calib/weights/calib_amax.json
timeout 3600 python tools/eval.py --weights "$W/best_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 448 --batch-size 48 \
    --int8 --calib-pt "$CAL" > "$Q/eval_int8_448.log" 2>&1
log "eval int8 448 rc=$?"
timeout 3600 python tools/eval.py --weights "$W/best_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 640 --batch-size 32 \
    --int8 --calib-pt "$CAL" > "$Q/eval_int8_640.log" 2>&1
log "eval int8 640 rc=$?"

# ---- 7. drain any extras queued mid-round before the nano block
drain_extras

# ---- 8. nano accuracy run (second model family), full cosine over 240
timeout 10800 python tools/train.py \
    --conf-file "$NCFG" \
    --img-size 448 --batch-size 48 --epochs 240 \
    --data-path "$DATA" \
    --cache-device --assigner atss_tal --eval-interval 20 --workers 2 \
    --epochs-per-dispatch 1 --name yololpn_v2_tal \
    > "$Q/train_n.log" 2>&1
log "train yololpn rc=$?"

WN=runs/train/yololpn_v2_tal/weights
timeout 3600 python tools/eval.py --weights "$WN/best_ckpt.msgpack" \
    --conf-file "$NCFG" --data "$DATA" --img-size 448 --batch-size 48 \
    > "$Q/eval_n_best448.log" 2>&1
log "eval nano best448 rc=$?"
timeout 3600 python tools/eval.py --weights "$WN/best_ckpt.msgpack" \
    --conf-file "$NCFG" --data "$DATA" --img-size 640 --batch-size 32 \
    > "$Q/eval_n_best640.log" 2>&1
log "eval nano best640 rc=$?"

# ---- 9. final bench validation + NMS variant probe (cuttable)
timeout 3600 python bench.py > "$Q/bench_final.json" 2> "$Q/bench_final.err"
log "bench_final rc=$?"
timeout 1800 python tools/bench_nms.py \
    > "$Q/nms_variants.json" 2> "$Q/nms_variants.err"
log "bench_nms rc=$?"

# ---- 10. tail drain: pick up extras until the round's driver kills us
while true; do drain_extras; sleep 30; done
