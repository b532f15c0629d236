#!/bin/bash
# QAT finetune at the trained operating point (VERDICT r3 #3: the reference
# quantifies its PTQ->QAT recovery at full accuracy, tools/qat/README.md).
# Runs in the stage-7 drain, i.e. AFTER stage-6 calib produced the amax
# table. Resumes the flagship best ckpt, fake-quant (STE) for 20 epochs at
# the cosine tail, then TRUE-int8 eval of the QAT weights.
set -u
cd /root/repo
W=runs/train/yololps_v2_tal/weights
CFG=yololp_tpu/configs/experiment/yololps_synth.py
DATA=runs/data/synth14k_v2.yaml
CAL=runs/train/yololps_v2_calib/weights/calib_amax.json
[ -f "$CAL" ] || { echo "no calib amax — stage 6 failed; skipping QAT"; exit 0; }
[ -f "$W/best_ckpt.msgpack" ] || { echo "no best ckpt; skipping QAT"; exit 0; }

EP=$(python - <<'EOF'
from yololp_tpu.utils.checkpoint import load_checkpoint_raw
c = load_checkpoint_raw("runs/train/yololps_v2_tal/weights/best_ckpt.msgpack")
print(int(c.get("epoch", -1)) + 21)
EOF
)
echo "QAT finetune horizon: --epochs $EP"

timeout 2700 python tools/train.py --conf-file "$CFG" \
    --quant --calib-pt "$CAL" --resume "$W/best_ckpt.msgpack" \
    --data-path "$DATA" --img-size 448 --batch-size 48 --epochs "$EP" \
    --cache-device --assigner atss_tal --eval-interval 10 --workers 2 \
    --epochs-per-dispatch 1 --name yololps_v2_qat
echo "qat train rc=$?"

WQ=runs/train/yololps_v2_qat/weights
timeout 3600 python tools/eval.py --weights "$WQ/best_ckpt.msgpack" \
    --conf-file "$CFG" --data "$DATA" --img-size 448 --batch-size 48 \
    --int8 --calib-pt "$CAL" > runs/q5/eval_qat_int8_448.log 2>&1
echo "qat int8 eval rc=$?"
