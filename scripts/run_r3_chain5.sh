#!/bin/bash
# Round-3 chip chain 5: after chain4 frees the chip, re-run the FID-level
# quality gates (scripts/bench_int8_quality.py, incl. --bench_path exact
# bench config) on the HARDENED 3,000-step golden torch fixture
# (VERDICT r2 weak #4 / next-round #6).  Waits for chain4 (pid file) to
# exit before claiming the chip; ONE TPU client at a time.
set -u
cd /root/repo

C4=$(cat /tmp/chain4.pid 2>/dev/null || echo "")
if [ -n "$C4" ]; then
  while kill -0 "$C4" 2>/dev/null; do sleep 30; done
fi
sleep 30  # let the freed chip claim settle

echo "=== quality gate on 3000-step fixture (exact bench config) ==="
timeout 3600 python scripts/bench_int8_quality.py --bench_path
echo "CHAIN5 DONE"
