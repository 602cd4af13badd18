#!/bin/bash
# Round-3 consolidated chip chain (after probes2):
#   1. quality gate for the exact round-3 bench path (nomax+phase int8)
#   2. official bench.py, twice
#   3. ADM phase A/Bs (ImageNet64 + LSUN)
#   4. ADM residual-gap bounds
#   5. flag probes on the NEW path (speculative)
set -u
cd /root/repo
while kill -0 "$(cat /tmp/r3probes2.pid 2>/dev/null)" 2>/dev/null; do
    sleep 20
done
timeout 2400 python scripts/bench_int8_quality.py --bench_path --skip_fused
echo "=== official bench.py ==="
timeout 1200 python bench.py
timeout 1200 python bench.py
echo "=== ADM phase A/B ==="
P="timeout 1500 python scripts/bench_adm_phase.py"
$P imagenet64_resize
$P imagenet64_phase
$P lsun_resize
$P lsun_phase
echo "=== ADM residual bounds ==="
G="timeout 1500 python scripts/bench_adm_gap.py"
$G base
$G gn_aff
$G no_silu
echo "=== flag probes (new path) ==="
F="timeout 900 python scripts/bench_r3_probe.py --up phase"
$F "--libtpu=--xla_tpu_rwb_fusion=false"
$F "--libtpu=--xla_tpu_memory_bound_loop_optimizer_options=enabled:true"
echo "CHAIN DONE"
