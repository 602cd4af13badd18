#!/bin/bash
# Round-3 probe session 1: shape re-sweep at the nomax point, then
# libtpu-flag probes at the best-known shape. Serial — ONE TPU client
# at a time (CLAUDE.md). Unknown flags crash their own probe only.
set -u
cd /root/repo
P="timeout 900 python scripts/bench_r3_probe.py"

# shape re-sweep (merged attention + nomax changed the cache footprint)
$P --batch 96 --nb 64                 # bench.py candidate (expect ~1976)
$P --batch 104 --nb 56
$P --batch 112 --nb 48
$P --batch 88 --nb 64
$P --batch 128 --nb 48

# libtpu flag probes at 96x64
$P --libtpu "--xla_tpu_rwb_fusion=false"
$P --libtpu "--xla_tpu_enable_latency_hiding_scheduler=false"
$P --libtpu "--xla_tpu_memory_bound_loop_optimizer_options=enabled:true"
$P --libtpu "--xla_tpu_enable_dot_strength_reduction=false"
echo "ALL PROBES DONE"
