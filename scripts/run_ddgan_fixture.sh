#!/bin/bash
# Round-5 trained DDGAN fixture (VERDICT r4 Missing #2 / task 4): train
# the T4_ddgan config NATIVELY — the reference snapshot ships no DDGAN
# module (SURVEY.md §2.0), so the native trainer through
# value_resample: true IS the oracle — and commit the run dir for
# trained-weight gating of the ~3,500 img/s DDGAN defaults.
# Reference experiment definition: configs/cifar10/T4_ddgan.yaml:2-9,
# README.md:97,120-124.
set -eu
cd /root/repo

if [ ! -f datasets/pt_inception-2015-12-05.npz ] || \
   [ ! -f datasets/cifar10_train_fid_stats.npz ]; then
    DXMI_PLATFORM=cpu timeout 1800 python scripts/make_fid_proxy.py --n 4096
fi

if [ ! -f runs_conv/pre_ddgan800.msgpack ]; then
    timeout 3600 python scripts/pretrain_ddgan.py \
        --out runs_conv/pre_ddgan800.msgpack --steps 800 --batch 128 \
        --fake_data --seed 7 --log_every 100
    sleep 25
fi

timeout 10800 python train_cifar10.py --config configs/cifar10/T4_ddgan.yaml \
    --dataset configs/cifar10/cifar10.yaml --run ddgan_r5_fixture \
    --fake_data --fake_data_size 16384 --max_steps 1500 \
    --training.sampler_ckpt runs_conv/pre_ddgan800.msgpack \
    --training.fid_epoch null --training.fid_every 250 \
    --training.n_fid_samples 2048 --training.sampling_batchsize 256 \
    --training.n_epochs 15 --training.lr 1e-6 --training.v_lr 1e-4 \
    2>&1 | tee /tmp/ddgan_fixture_r5.log
echo "DDGAN FIXTURE RUN DONE"
