#!/bin/bash
# Round-3 chip chain 2b (reprioritized for the remaining round budget):
#   1. on-chip convergence run (VERDICT r2 #2, second half)
#   2. quality gate for the exact bench path on the 3000-step fixture
#      (VERDICT r2 #1 citation + weak #4 non-toy weights; the first gate
#      attempt hit its 2400s cap mid-compile)
#   3. 50k generation rehearsal (VERDICT r2 #4)
#   4. train-step lever A/B (VERDICT r2 #8)
# Waits for chain1's ADM phase A/Bs, then CUTS chain1's speculative
# tail (residual-gap bounds + libtpu flag probes) to fit the budget.
set -u
cd /root/repo
while kill -0 "$(cat /tmp/r3chain.pid 2>/dev/null)" 2>/dev/null; do
    if grep -q "ADM residual bounds" /tmp/r3chain.log 2>/dev/null; then
        P=$(cat /tmp/r3chain.pid)
        C=$(ps -o pid= --ppid "$P" 2>/dev/null)
        kill "$P" 2>/dev/null
        for c in $C; do
            G=$(ps -o pid= --ppid "$c" 2>/dev/null)
            kill $c $G 2>/dev/null
        done
        echo "chain1 speculative tail cut"
        sleep 120   # a killed client's chip claim lingers minutes
        break
    fi
    sleep 30
done
echo "=== convergence chip run ==="
bash scripts/run_convergence_chip.sh
# bounded wait for the 3000-step torch fixture retrain so the gate runs
# on non-toy weights (VERDICT r2 weak #4); on timeout/crash the dir
# still holds the committed 150-step fixture (save is end-of-run)
W=0
while [ $W -lt 4500 ]; do
    grep -q "fixture written" /tmp/fixture3000b.log 2>/dev/null && break
    kill -0 "$(cat /tmp/fixture3000b.pid 2>/dev/null)" 2>/dev/null || break
    sleep 60; W=$((W + 60))
done
echo "=== quality gate (exact bench path) ==="
timeout 5400 python scripts/bench_int8_quality.py --bench_path --skip_fused \
    || { sleep 180; timeout 5400 python scripts/bench_int8_quality.py \
         --bench_path --skip_fused; }
echo "=== 50k rehearsal ==="
bash scripts/run_50k_rehearsal.sh
echo "=== train-step levers ==="
timeout 2400 python scripts/bench_train_r3.py base
timeout 2400 python scripts/bench_train_r3.py levers
echo "CHAIN2B DONE"
