#!/bin/bash
# Round-3 session 5: quality gate for the exact round-3 bench path,
# then the OFFICIAL bench.py run on an otherwise-idle host.
set -u
cd /root/repo
while kill -0 "$(cat /tmp/r3probes4.pid 2>/dev/null)" 2>/dev/null; do
    sleep 20
done
timeout 2400 python scripts/bench_int8_quality.py --bench_path --skip_fused
echo "=== official bench.py ==="
timeout 1200 python bench.py
timeout 1200 python bench.py
echo "PROBES5 DONE"
