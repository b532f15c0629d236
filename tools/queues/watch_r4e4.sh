#!/bin/bash
# Watcher: the running tpuq_r4e4.sh has a broken nano leg (epd=4 kills
# the TPU worker). The moment its int8-640 eval logs (or its nano leg
# starts), kill the r4e4 process group and launch tpuq_r4e5.sh instead.
set -u
cd /root/repo
Q=runs/q4e
QPID=$(cat runs/tpuq_r4e4.pid)
while true; do
    if ! kill -0 "$QPID" 2>/dev/null; then
        echo "[watch] r4e4 already gone" >> "$Q/queue.log"
        break
    fi
    if grep -q "eval int8 640 rc=" "$Q/queue.log" 2>/dev/null \
       || [ -s "$Q/train_n.log" ]; then
        echo "[watch] intercepting r4e4 before/at nano leg" >> "$Q/queue.log"
        kill -TERM -- -"$QPID" 2>/dev/null
        sleep 3
        kill -KILL -- -"$QPID" 2>/dev/null
        break
    fi
    sleep 5
done
rm -f "$Q/train_n.log"
sleep 5
setsid nohup bash runs/tpuq_r4e5.sh > "$Q/launcher5.log" 2>&1 < /dev/null &
echo $! > runs/tpuq_r4e5.pid
echo "[watch] r4e5 launched ($(cat runs/tpuq_r4e5.pid))" >> "$Q/queue.log"
