#!/bin/bash
# round-5c device queue (fresh session 14:30 UTC Aug 19). The dataset is
# regenerated (runs/data/synth14k_v2.yaml, 14:12) and bench_r5b is green
# (14:12), so this queue goes STRAIGHT to the flagship retrain — the
# time-critical item — then runs time-gated downstream stages in VERDICT
# priority order. Serial jobs on the single tunnel chip; exclusive flock;
# epd=1 ONLY (the tunnel kills dispatches longer than ~60s — CLAUDE.md).
# NEVER edit this file while it may be running — write a new filename.
set -u
cd /root/repo
exec 9>runs/.device.lock
flock -n 9 || { echo "another queue holds runs/.device.lock; abort" >&2; exit 1; }
mkdir -p runs/q5c runs/q5c/extra_jobs.d runs/q5c/extra_done docs/evidence/r5
Q=runs/q5c
EV=docs/evidence/r5
log() { echo "[$(date -u '+%m-%d %H:%M:%S')] $*" >> "$Q/queue.log"; }
now() { date +%s; }
# Hard end: stop starting new device work after this (driver runs bench.py
# at round end; we must not contend). 21:55 UTC.
HARD_END=$(date -u -d '2026-08-19 21:55' +%s)

log "r5c queue start (pid $$, hard_end $(date -u -d @$HARD_END '+%H:%M:%S'))"

DATA=runs/data/synth14k_v2.yaml
CFG=yololp_tpu/configs/experiment/yololps_synth.py
NCFG=yololp_tpu/configs/experiment/yololpn_synth.py

bank() {  # bank <src> <dst-name>: copy evidence into the git-tracked dir
    [ -e "$1" ] && cp -f "$1" "$EV/$2" && log "banked $2"
}

drain_extras() {
    for j in "$Q"/extra_jobs.d/*.sh; do
        [ -e "$j" ] || continue
        b=$(basename "$j")
        [ -e "$Q/extra_done/$b" ] && continue
        log "extra job $b start"
        timeout 3600 bash "$j" > "$Q/extra_${b%.sh}.log" 2>&1
        log "extra job $b rc=$?"
        touch "$Q/extra_done/$b"
        bank "$Q/extra_${b%.sh}.log" "extra_${b%.sh}.log"
    done
}

# ---- 0. 90s preflight probe (device was healthy 18 min ago; just confirm)
timeout 180 python - > "$Q/preflight.log" 2>&1 <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((1024, 1024), jnp.bfloat16)
print(jax.devices(), float((x @ x).sum()))
EOF
rc=$?
log "preflight rc=$rc"
if [ $rc -ne 0 ]; then
    log "preflight FAILED - retrying once after 120s"
    sleep 120
    timeout 180 python - > "$Q/preflight2.log" 2>&1 <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((1024, 1024), jnp.bfloat16)
print(jax.devices(), float((x @ x).sum()))
EOF
    log "preflight2 rc=$?"
fi

# ---- 1. flagship retrain: proven v2 recipe (600-ep cosine, atss_tal,
#         cache-device), epd=1. ~5.5-5.8h.
timeout 23400 python tools/train.py \
    --conf-file "$CFG" \
    --img-size 448 --batch-size 48 --epochs 600 \
    --data-path "$DATA" \
    --cache-device --assigner atss_tal --eval-interval 20 --workers 2 \
    --epochs-per-dispatch 1 --name yololps_v2_tal \
    > "$Q/train_s.log" 2>&1
log "train yololps rc=$?"
W=runs/train/yololps_v2_tal/weights
tail -c 200000 "$Q/train_s.log" > "$EV/train_s_tail.log"
bank runs/train/yololps_v2_tal/events.jsonl events_yololps_v2_tal.jsonl

# ---- 2. endpoint evals: best@448 (r3 protocol), best@640 (headline), last@448
timeout 3600 python tools/eval.py --weights "$W/best_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 448 --batch-size 48 \
    > "$Q/eval_best448.log" 2>&1
log "eval best448 rc=$?"
bank "$Q/eval_best448.log" eval_best448.log
timeout 3600 python tools/eval.py --weights "$W/best_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 640 --batch-size 32 \
    > "$Q/eval_best640.log" 2>&1
log "eval best640 rc=$?"
bank "$Q/eval_best640.log" eval_best640.log
timeout 3600 python tools/eval.py --weights "$W/last_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 448 --batch-size 48 \
    > "$Q/eval_last448.log" 2>&1
log "eval last448 rc=$?"
bank "$Q/eval_last448.log" eval_last448.log

# ---- 3. PTQ calibration at the trained operating point + TRUE-int8 eval
timeout 5400 python tools/train.py --conf-file "$CFG" --quant --calib \
    --resume "$W/best_ckpt.msgpack" --name yololps_v2_calib \
    --data-path "$DATA" --img-size 448 --batch-size 48 --workers 2 \
    > "$Q/calib.log" 2>&1
log "calib rc=$?"
CAL=runs/train/yololps_v2_calib/weights/calib_amax.json
bank "$CAL" calib_amax.json
timeout 3600 python tools/eval.py --weights "$W/best_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 448 --batch-size 48 \
    --int8 --calib-pt "$CAL" > "$Q/eval_int8_448.log" 2>&1
log "eval int8 448 rc=$?"
bank "$Q/eval_int8_448.log" eval_int8_448.log

# ---- 4. QAT finetune (time-gated: needs ~45 min incl. its own int8 eval)
mkdir -p runs/q5   # 60_qat_finetune.sh writes its eval log there
if [ "$(now)" -lt $((HARD_END - 4500)) ]; then
    timeout 3600 bash tools/queues/q5_extras/60_qat_finetune.sh \
        > "$Q/qat.log" 2>&1
    log "qat rc=$?"
    bank "$Q/qat.log" qat.log
    bank "$Q/eval_qat_int8_448.log" eval_qat_int8_448.log
    # 60_qat_finetune.sh writes its int8 eval to runs/q5/…; also check q5c
    bank runs/q5/eval_qat_int8_448.log eval_qat_int8_448.log
else
    log "qat SKIPPED (time gate)"
fi

# ---- 5. int8 eval at 640 (gated, secondary to the 448 protocol number)
if [ "$(now)" -lt $((HARD_END - 3000)) ]; then
    timeout 3600 python tools/eval.py --weights "$W/best_ckpt.msgpack" \
        --conf-file "$CFG" --data "$DATA" --img-size 640 --batch-size 32 \
        --int8 --calib-pt "$CAL" > "$Q/eval_int8_640.log" 2>&1
    log "eval int8 640 rc=$?"
    bank "$Q/eval_int8_640.log" eval_int8_640.log
else
    log "int8 640 SKIPPED (time gate)"
fi

# ---- 6. drain extras queued mid-round (e.g. int8 neck-fusion probe)
drain_extras

# ---- 7. nano run: dynamic horizon from remaining budget (~17 s/epoch at
#         epd=1 for the nano; leave 1200 s for its eval + final bench)
REMAIN=$(( HARD_END - $(now) - 1200 ))
NEP=$(( REMAIN / 17 ))
[ "$NEP" -gt 240 ] && NEP=240
if [ "$NEP" -ge 100 ]; then
    log "train yololpn for $NEP epochs"
    timeout $((REMAIN + 600)) python tools/train.py \
        --conf-file "$NCFG" \
        --img-size 448 --batch-size 48 --epochs "$NEP" \
        --data-path "$DATA" \
        --cache-device --assigner atss_tal --eval-interval 20 --workers 2 \
        --epochs-per-dispatch 1 --name yololpn_v2_tal \
        > "$Q/train_n.log" 2>&1
    log "train yololpn rc=$?"
    tail -c 100000 "$Q/train_n.log" > "$EV/train_n_tail.log"
    WN=runs/train/yololpn_v2_tal/weights
    timeout 3600 python tools/eval.py --weights "$WN/best_ckpt.msgpack" \
        --conf-file "$NCFG" --data "$DATA" --img-size 448 --batch-size 48 \
        > "$Q/eval_n_best448.log" 2>&1
    log "eval nano best448 rc=$?"
    bank "$Q/eval_n_best448.log" eval_n_best448.log
else
    log "nano SKIPPED (only ${REMAIN}s left)"
fi

# ---- 8. final bench (records the new b128 train number if bench.py was
#         updated this round) — only if we still have budget
if [ "$(now)" -lt $((HARD_END + 600)) ]; then
    timeout 3000 python bench.py > "$Q/bench_final.json" 2> "$Q/bench_final.err"
    log "bench_final rc=$?"
    bank "$Q/bench_final.json" bench_final.json
fi

log "queue done — releasing device lock"
exit 0
