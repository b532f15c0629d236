#!/bin/bash
# round-4e2 device queue (supersedes tpuq_r4e.sh, which was killed before
# claiming the device). Serial jobs on the single tunnel chip. NEVER edit
# while running — write a new filename instead.
#
# Lesson from r4d: TWO queue scripts ran concurrently 15:38-16:30 Aug 18
# and poisoned every measurement in that window (int8 e2e "530 ms" vs the
# true quiet-host 33.8 ms). This queue takes an exclusive flock on
# runs/.device.lock; all future queues must do the same.
#
# New in e2: a gated window between the quick probes and the 6-hour
# training block. Scripts dropped into runs/q4e/extra_jobs.d/*.sh run
# serially inside the window; training starts when runs/q4e/gate_training
# appears OR at the deadline, whichever is first — so a lost session can
# never stall the queue.
set -u
cd /root/repo
exec 9>runs/.device.lock
flock -n 9 || { echo "another queue holds runs/.device.lock; abort" >&2; exit 1; }
mkdir -p runs/q4e runs/q4e/extra_jobs.d runs/q4e/extra_done
Q=runs/q4e
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*" >> "$Q/queue.log"; }

log "q4e2 queue start (pid $$)"

# ---- 0. wait for the validation bench launched before this queue
while ps -p "$(cat runs/q4e/bench.pid 2>/dev/null || echo 0)" > /dev/null 2>&1; do
    sleep 20
done
log "bench_validate done"

# ---- 1. MXU rate probe v2: latency-corrected (timed_scan_delta, shapes
#         resized for >=10ms programs), incl. pallas int8 rows
timeout 3600 python tools/probe_mxu_int8.py --iters 20 \
    > "$Q/probe_mxu_v2.json" 2> "$Q/probe_mxu_v2.err"
log "probe_mxu_v2 rc=$?"

# ---- 2. train-step decomposition at the accuracy-run config (train MFU
#         is ~13% — attribution for the biggest remaining perf headroom)
timeout 3600 python tools/profile_train.py --conf-file yololps \
    --batch-size 48 --img-size 448 --assigner tal --iters 10 \
    > "$Q/profile_train_448.json" 2> "$Q/profile_train_448.err"
log "profile_train 448 rc=$?"

# ---- 2.5 gated extra-jobs window (pallas int8 conv probe etc.)
DEADLINE=$(( $(date +%s) + 7800 ))   # at most ~2.2h after probes finish
log "extra-jobs window open (deadline $(date -u -d @$DEADLINE '+%H:%M:%S'))"
while [ ! -f "$Q/gate_training" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; do
    ran=0
    for j in "$Q"/extra_jobs.d/*.sh; do
        [ -e "$j" ] || continue
        b=$(basename "$j")
        [ -e "$Q/extra_done/$b" ] && continue
        log "extra job $b start"
        timeout 3600 bash "$j" > "$Q/extra_${b%.sh}.log" 2>&1
        log "extra job $b rc=$?"
        touch "$Q/extra_done/$b"
        ran=1
    done
    [ "$ran" = 0 ] && sleep 15
done
log "extra-jobs window closed (gate=$([ -f $Q/gate_training ] && echo yes || echo deadline))"

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

# ---- 7. nano accuracy run (second model family, VERDICT r3 #4)
timeout 12600 python tools/train.py \
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
timeout 3600 python tools/eval.py --weights "$WN/best_ckpt.msgpack" \
    --conf-file yololp_tpu/configs/experiment/yololpn_synth.py \
    --data "$DATA" --img-size 640 --batch-size 32 \
    > "$Q/eval_n_best640.log" 2>&1
log "eval nano best640 rc=$?"

log "q4e2 queue complete"
