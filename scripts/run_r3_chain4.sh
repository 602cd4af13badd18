#!/bin/bash
# Round-3 chip chain 4 (this session): after the 50k rehearsal frees the
# chip —
#   1. batch-blocked fused-attention probe (ops/attn_block._kernel_bb)
#      vs the einsum_merged bench path (4 one-process runs)
#   2. train-step lever A/B (VERDICT r2 next-round #8)
#   3. one official bench.py run (warms this host's compile cache for
#      the driver's end-of-round invocation)
# Serialized: ONE TPU client at a time; sleeps between runs let the
# freed chip claim settle.
set -u
cd /root/repo
gap() { sleep 20; }

echo "=== attn bb probe ==="
timeout 1200 python scripts/bench_attn_bb.py --attn merged; gap
timeout 1200 python scripts/bench_attn_bb.py --attn fused --bb 1; gap
timeout 1200 python scripts/bench_attn_bb.py --attn fused --bb 4; gap
timeout 1200 python scripts/bench_attn_bb.py --attn fused --bb 8; gap
timeout 1200 python scripts/bench_attn_bb.py --attn fused --bb 16; gap

echo "=== train-step levers ==="
timeout 2400 python scripts/bench_train_r3.py base; gap
timeout 2400 python scripts/bench_train_r3.py levers; gap

echo "=== official bench ==="
timeout 1200 python bench.py
echo "CHAIN4 DONE"
