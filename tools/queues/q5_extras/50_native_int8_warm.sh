#!/bin/bash
# Native-runner bench with the upgraded (fresh-buffer + pipelined) loop:
# int8 first (its bench_early leg timed out in a cold server-side compile
# >1200 s — this longer budget both records the number and warms the
# compile cache for bench_final), then bf16 for the pipelined comparison.
cd /root/repo
timeout 3000 deploy/pjrt_cpp/yololp_runner \
    --plugin /opt/axon/libaxon_pjrt.so \
    --model /tmp/yololps_int8_640.stablehlo \
    --copts /tmp/yololps_int8_640.stablehlo.copts \
    --bench 20 --batch 128 --size 640 > runs/q5/native_int8_warm.json 2>&1
echo "int8 rc=$?"
timeout 1800 deploy/pjrt_cpp/yololp_runner \
    --plugin /opt/axon/libaxon_pjrt.so \
    --model /tmp/yololps_bf16_640.stablehlo \
    --copts /tmp/yololps_bf16_640.stablehlo.copts \
    --bench 20 --batch 128 --size 640 > runs/q5/native_bf16_pipe.json 2>&1
echo "bf16 rc=$?"
