#!/bin/bash
# Nano (yololpn) trained evidence (VERDICT r4 #5): the main queue's stage-7
# nano gate requires >=100 epochs of budget AFTER the drain, which the
# timeline analysis says will not be left. This extra runs nano in the
# drain itself with a dynamic horizon (min 80 epochs to be presentable),
# then evals best@448 and banks the log under the eval_* naming the
# evidence collector parses. Self-skips when the budget is short —
# stage 7 then gets its (futile) chance anyway.
set -u
cd /root/repo
NCFG=yololp_tpu/configs/experiment/yololpn_synth.py
DATA=runs/data/synth14k_v2.yaml
EV=docs/evidence/r5

[ -d runs/train/yololpn_v2_tal ] && { echo "nano already trained; skip"; exit 0; }

NOW=$(date +%s)
# leave 600s for the standalone eval (compile-heavy) + 120s slack before
# the 21:55 hard end; ~210s startup/compile/cache, ~17.5 s/epoch at epd=1
DEADLINE=$(date -u -d '2026-08-19 21:52' +%s)
BUDGET=$(( DEADLINE - NOW - 600 - 210 ))
NEP=$(( BUDGET * 2 / 35 ))
[ "$NEP" -gt 240 ] && NEP=240
[ "$NEP" -lt 80 ] && { echo "only ${BUDGET}s budget (${NEP} epochs) — skip"; exit 0; }
echo "nano train: $NEP epochs"

timeout $(( BUDGET + 400 )) python tools/train.py \
    --conf-file "$NCFG" \
    --img-size 448 --batch-size 48 --epochs "$NEP" \
    --data-path "$DATA" \
    --cache-device --assigner atss_tal --eval-interval 20 --workers 2 \
    --epochs-per-dispatch 1 --name yololpn_v2_tal
echo "nano train rc=$?"
WN=runs/train/yololpn_v2_tal/weights
[ -f runs/train/yololpn_v2_tal/events.jsonl ] && \
    cp -f runs/train/yololpn_v2_tal/events.jsonl "$EV/events_yololpn_v2_tal.jsonl"
CKPT="$WN/best_ckpt.msgpack"
[ -f "$CKPT" ] || CKPT="$WN/last_ckpt.msgpack"
[ -f "$CKPT" ] || { echo "nano produced no checkpoint"; exit 1; }

timeout 1200 python tools/eval.py --weights "$CKPT" \
    --conf-file "$NCFG" --data "$DATA" --img-size 448 --batch-size 48 \
    > runs/q5c/eval_n_best448.log 2>&1
echo "nano eval rc=$?"
cp -f runs/q5c/eval_n_best448.log "$EV/eval_n_best448.log" && \
    echo "banked eval_n_best448.log"
