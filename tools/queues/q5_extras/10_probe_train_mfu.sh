#!/bin/bash
cd /root/repo
python tools/probe_train_mfu.py --iters 8 \
    --shapes 48x448,128x448,32x640,128x640 > runs/q5/probe_train_mfu.json
