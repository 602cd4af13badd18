#!/bin/bash
# Round-3 reference-scale generation rehearsal (VERDICT r2 missing #3 /
# next-round #4): the reference's headline workflow is 50k samples ->
# npz -> evaluator (/root/reference/README.md:160-198,
# generate_cifar10.py:195-228). Records wall-clock + peak host RSS.
#
# Stage A: 50k CIFAR samples, streaming npz, on the chip, from the
#          full-size golden-fixture run dir.
# Stage B: evaluator pass over the resulting npz (FID/sFID/IS/P&R
#          against the proxy stats npz — relative-only numbers, real
#          code path).
# Stage C: LSUN-256-shape bounded run through generate_large
#          --skip_fid (526M params): 512 images, streaming npz.
set -eu
cd /root/repo
mkdir -p /tmp/rehearsal

if [ ! -d /tmp/rehearsal/rundir_cifar ]; then
    DXMI_PLATFORM=cpu timeout 900 python scripts/make_fullsize_rundir.py \
        /tmp/rehearsal/rundir_cifar
fi

echo "=== stage A: 50k generation -> npz (chip) ==="
python scripts/timev.py timeout 3000 python generate_cifar10.py \
    --log_dir /tmp/rehearsal/rundir_cifar -n 50000 --batchsize 500 \
    --save_npz /tmp/rehearsal/cifar50k.npz --seed 7 \
    2>&1 | grep -Ev "^\s*$" | tail -25
ls -la /tmp/rehearsal/cifar50k.npz

echo "=== stage B: evaluator over the 50k npz (chip) ==="
# ref IMAGE batch (not cached stats) so the sFID/Precision/Recall paths
# run at scale too, like the reference's README workflow
if [ ! -f /tmp/rehearsal/ref10k.npz ]; then
    DXMI_PLATFORM=cpu python - <<'EOF'
import numpy as np
from dxmi_tpu.data.cifar10 import fake_cifar
np.savez("/tmp/rehearsal/ref10k.npz",
         arr_0=fake_cifar(10000, 112233).images)
EOF
fi
python scripts/timev.py timeout 3000 python evaluations/evaluator.py \
    /tmp/rehearsal/ref10k.npz /tmp/rehearsal/cifar50k.npz \
    2>&1 | tail -15

echo "=== stage C: LSUN-256 shape (526M) bounded generate_large ==="
if [ ! -d /tmp/rehearsal/rundir_lsun ]; then
    DXMI_PLATFORM=cpu timeout 1800 python scripts/make_fullsize_rundir.py \
        /tmp/rehearsal/rundir_lsun configs/lsun/T4.yaml
fi
python scripts/timev.py timeout 3000 python generate_large.py \
    --log_dir /tmp/rehearsal/rundir_lsun --n_sample 512 --batchsize 16 \
    --skip_fid --save_npz /tmp/rehearsal/lsun512.npz --int8 \
    2>&1 | tail -15
ls -la /tmp/rehearsal/lsun512.npz
echo "REHEARSAL DONE"
