#!/bin/bash
# Round-3 probe session 2: phase-decomposed upsample at the bench point.
set -u
cd /root/repo
# wait for session 1 to release the chip (ONE TPU client at a time)
while kill -0 "$(cat /tmp/r3probes.pid 2>/dev/null)" 2>/dev/null; do
    sleep 20
done
P="timeout 900 python scripts/bench_r3_probe.py"
$P --up phase                       # int8 bench path + phase upsample
$P --up phase --batch 112 --nb 48   # phase may shift the batch optimum
$P --up phase --batch 128 --nb 48
echo "PROBES2 DONE"
