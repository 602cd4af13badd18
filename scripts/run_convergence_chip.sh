#!/bin/bash
# Round-3 convergence stage 2 (VERDICT r2 next-round #2, second half):
# an on-chip full-size CIFAR DxMI run where the FID proxy FALLS and the
# best-checkpoint gate FIRES (the reference loop's purpose,
# /root/reference/train_cifar10.py:386-442).
#
# Recipe: deliberately UNDER-pretrain the sampler (800 eps-matching
# steps on the structured fake data), then let DxMI training close the
# gap. FID here is the relative-only proxy (synthetic-weight Inception,
# stats over the same fake dataset — scripts/make_fid_proxy.py); it
# exercises the exact production path: un-mocked BN-fold weight load,
# stats cache, best gating.
set -eu
cd /root/repo

# 1. proxy Inception weights + dataset stats at the DEFAULT paths (CPU)
if [ ! -f datasets/pt_inception-2015-12-05.npz ] || \
   [ ! -f datasets/cifar10_train_fid_stats.npz ]; then
    DXMI_PLATFORM=cpu timeout 1800 python scripts/make_fid_proxy.py --n 4096
fi

# 2. under-pretrained sampler (chip)
mkdir -p runs_conv
timeout 1800 python scripts/pretrain_ddpm.py --out runs_conv/pre800.msgpack \
    --steps 800 --batch 128 --fake_data --log_every 100

# 3. DxMI training with in-training FID every 250 steps (chip)
timeout 7200 python train_cifar10.py --config configs/cifar10/T10.yaml \
    --dataset configs/cifar10/cifar10.yaml --run conv_r3 --fake_data \
    --fake_data_size 16384 --max_steps 2500 \
    --training.sampler_ckpt runs_conv/pre800.msgpack \
    --training.fid_epoch null --training.fid_every 250 \
    --training.n_fid_samples 2048 --training.sampling_batchsize 256 \
    --training.n_epochs 25 --training.lr 1e-5 --training.v_lr 1e-4 \
    2>&1 | tee /tmp/conv_chip.log
echo "CONVERGENCE RUN DONE"
