#!/bin/bash
# Round-3 probe session 3: libtpu-flag probes at 96x64 (fixed =syntax).
set -u
cd /root/repo
while kill -0 "$(cat /tmp/r3probes2.pid 2>/dev/null)" 2>/dev/null; do
    sleep 20
done
P="timeout 900 python scripts/bench_r3_probe.py"
$P "--libtpu=--xla_tpu_rwb_fusion=false"
$P "--libtpu=--xla_tpu_enable_latency_hiding_scheduler=false"
$P "--libtpu=--xla_tpu_memory_bound_loop_optimizer_options=enabled:true"
$P "--libtpu=--xla_tpu_enable_dot_strength_reduction=false"
echo "PROBES3 DONE"
