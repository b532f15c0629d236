#!/bin/bash
# Warm/measure the native int8 runner with a generous compile budget: the
# bench's 1200s leg timed out on a cold server-side compile of the freshly
# re-exported int8 artifact (bench_early r5). A completed run both records
# the number and warms the server compile cache for bench_final.
cd /root/repo
timeout 3000 deploy/pjrt_cpp/yololp_runner \
    --plugin /opt/axon/libaxon_pjrt.so \
    --model /tmp/yololps_int8_640.stablehlo \
    --copts /tmp/yololps_int8_640.stablehlo.copts \
    --bench 20 --batch 128 --size 640 > runs/q5/native_int8_warm.json
