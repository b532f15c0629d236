#!/bin/bash
# QAT finetune insurance (VERDICT r4 #2 — the two-rounds-slipped item):
# the main queue's stage-4 QAT gate (now < 20:40 UTC) will fail if the
# flagship train runs long, silently dropping QAT from the evidence. This
# extra re-attempts QAT in the stage-6 drain with a DYNAMIC horizon fitted
# to the remaining budget. Skips itself when stage-4 already ran, when the
# calib table is missing, or when too little time remains for a
# meaningful (>=8 epoch) finetune + its int8 eval.
set -u
cd /root/repo
W=runs/train/yololps_v2_tal/weights
CFG=yololp_tpu/configs/experiment/yololps_synth.py
DATA=runs/data/synth14k_v2.yaml
CAL=runs/train/yololps_v2_calib/weights/calib_amax.json
EV=docs/evidence/r5

[ -d runs/train/yololps_v2_qat ] && { echo "stage-4 QAT already ran; skip"; exit 0; }
[ -f "$CAL" ] || { echo "no calib amax — stage 3 failed; skip"; exit 0; }
[ -f "$W/best_ckpt.msgpack" ] || { echo "no best ckpt; skip"; exit 0; }

NOW=$(date +%s)
# train portion must end in time for its int8 eval (~720s incl compile)
# and leave the queue room before the 21:55 hard end; 240s startup/compile.
DEADLINE=$(date -u -d '2026-08-19 21:40' +%s)
BUDGET=$(( DEADLINE - NOW - 720 - 240 ))
EPR=$(( BUDGET / 33 ))
[ "$EPR" -gt 20 ] && EPR=20
[ "$EPR" -lt 8 ] && { echo "only ${BUDGET}s budget (${EPR} epochs) — skip"; exit 0; }

BASE_EP=$(python - <<'EOF'
from yololp_tpu.utils.checkpoint import load_checkpoint_raw
c = load_checkpoint_raw("runs/train/yololps_v2_tal/weights/best_ckpt.msgpack")
print(int(c.get("epoch", -1)) + 1)
EOF
)
EP=$(( BASE_EP + EPR ))
echo "QAT finetune: resume e$BASE_EP, +$EPR epochs (--epochs $EP)"

timeout $(( BUDGET + 600 )) python tools/train.py --conf-file "$CFG" \
    --quant --calib-pt "$CAL" --resume "$W/best_ckpt.msgpack" \
    --data-path "$DATA" --img-size 448 --batch-size 48 --epochs "$EP" \
    --cache-device --assigner atss_tal --eval-interval 10 --workers 2 \
    --epochs-per-dispatch 1 --name yololps_v2_qat
echo "qat train rc=$?"

WQ=runs/train/yololps_v2_qat/weights
CKPT="$WQ/best_ckpt.msgpack"
[ -f "$CKPT" ] || CKPT="$WQ/last_ckpt.msgpack"
[ -f "$CKPT" ] || { echo "QAT produced no checkpoint"; exit 1; }
timeout 1500 python tools/eval.py --weights "$CKPT" \
    --conf-file "$CFG" --data "$DATA" --img-size 448 --batch-size 48 \
    --int8 --calib-pt "$CAL" > runs/q5c/eval_qat_int8_448.log 2>&1
echo "qat int8 eval rc=$?"
cp -f runs/q5c/eval_qat_int8_448.log "$EV/eval_qat_int8_448.log" && \
    echo "banked eval_qat_int8_448.log"
