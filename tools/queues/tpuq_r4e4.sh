#!/bin/bash
# round-4e4 device queue. The r4e3 runs proved --epochs-per-dispatch 20
# KILLS the TPU worker ("TPU worker process crashed or restarted") on the
# first multi-epoch dispatch — twice, flagship and nano, once with a
# quiet host — consistent with an execution watchdog on the tunnel
# killing a ~140 s single dispatch. Epoch-0's ~7 s dispatch is fine.
# This queue uses 4-epoch dispatches (~28 s device per dispatch) and
# falls back to the r3-proven single-epoch path (with resume) if the
# worker dies again. NEVER edit while running.
set -u
cd /root/repo
exec 9>runs/.device.lock
flock -n 9 || { echo "another queue holds runs/.device.lock; abort" >&2; exit 1; }
mkdir -p runs/q4e
Q=runs/q4e
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*" >> "$Q/queue.log"; }

log "q4e4 queue start (pid $$)"

W=runs/train/yololps_v2_tal/weights
CFG=yololp_tpu/configs/experiment/yololps_synth.py
DATA=runs/data/synth14k_v2.yaml

train_flagship() {  # $1 = epochs-per-dispatch, $2 = extra args
    timeout 21600 python tools/train.py \
        --conf-file "$CFG" \
        --img-size 448 --batch-size 48 --epochs 600 \
        --data-path "$DATA" \
        --cache-device --assigner atss_tal --eval-interval 20 --workers 2 \
        --epochs-per-dispatch "$1" --name yololps_v2_tal $2 \
        >> "$Q/train_s.log" 2>&1
}

# ---- 3. flagship retrain, epd=4; fallback epd=1 (+resume) on crash
train_flagship 4 ""
rc=$?
log "train yololps epd4 rc=$rc"
if [ "$rc" != 0 ]; then
    sleep 180   # let the TPU worker restart
    RES=""
    [ -f "$W/last_ckpt.msgpack" ] && RES="--resume $W/last_ckpt.msgpack"
    train_flagship 1 "$RES"
    log "train yololps epd1 fallback rc=$?"
fi

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

# ---- 7. nano accuracy run (second model family), 400-epoch full anneal
timeout 12600 python tools/train.py \
    --conf-file yololp_tpu/configs/experiment/yololpn_synth.py \
    --img-size 448 --batch-size 48 --epochs 400 \
    --data-path "$DATA" \
    --cache-device --assigner atss_tal --eval-interval 20 --workers 2 \
    --epochs-per-dispatch 4 --name yololpn_v2_tal \
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

log "q4e4 queue complete"
