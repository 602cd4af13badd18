#!/bin/bash
# Round-5 fast-levers convergence gate (VERDICT r4 weak #4 / task 6):
# the -28% train step (`--fast_levers`: bf16 sampler torso + bf16 VALUE
# net + bf16_onepass GN in the backward path + 64-chunk sampling)
# changes training numerics; all prior convergence runs used the parity
# config.  Re-run the conv_r4_refenv recipe (CONVERGENCE.md §5)
# UNCHANGED except --fast_levers: same pre800 sampler, same lr envelope
# (reference 100x ratio), same proxy-FID cadence — if the curve shows
# the same shape/endpoint class, the flag is safe to recommend as the
# production fast path.
set -eu
cd /root/repo

if [ ! -f datasets/pt_inception-2015-12-05.npz ] || \
   [ ! -f datasets/cifar10_train_fid_stats.npz ]; then
    DXMI_PLATFORM=cpu timeout 1800 python scripts/make_fid_proxy.py --n 4096
fi

if [ ! -f runs_conv/pre800.msgpack ]; then
    timeout 1800 python scripts/pretrain_ddpm.py \
        --out runs_conv/pre800.msgpack --steps 800 --batch 128 \
        --fake_data --log_every 100
    sleep 25
fi

timeout 10800 python train_cifar10.py --config configs/cifar10/T10.yaml \
    --dataset configs/cifar10/cifar10.yaml --run conv_r5_fastlevers \
    --fake_data --fake_data_size 16384 --max_steps 2500 --fast_levers \
    --training.sampler_ckpt runs_conv/pre800.msgpack \
    --training.fid_epoch null --training.fid_every 250 \
    --training.n_fid_samples 2048 --training.sampling_batchsize 256 \
    --training.n_epochs 25 --training.lr 1e-6 --training.v_lr 1e-4 \
    2>&1 | tee /tmp/conv_fastlevers_r5.log
echo "FASTLEVERS CONVERGENCE RUN DONE"
