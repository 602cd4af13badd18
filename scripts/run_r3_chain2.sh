#!/bin/bash
# Round-3 chip chain part 2 (after run_r3_chain.sh):
#   1. train-step lever A/B (VERDICT #8)
#   2. on-chip convergence run (VERDICT #2 second half)
#   3. 50k rehearsal (VERDICT #4)
set -u
cd /root/repo
while kill -0 "$(cat /tmp/r3chain.pid 2>/dev/null)" 2>/dev/null; do
    sleep 30
done
timeout 2400 python scripts/bench_train_r3.py base
timeout 2400 python scripts/bench_train_r3.py levers
bash scripts/run_convergence_chip.sh
bash scripts/run_50k_rehearsal.sh
echo "CHAIN2 DONE"
