"""Shared tiny DxMI program for the multi-host equivalence test.

Runs one full DxMI step (trajectory -> buffer -> update_f_v ->
update_sampler) over a 1-D ``data`` mesh spanning ALL global devices,
feeding the images through ``parallel.global_batch`` from each process's
LOCAL slice — the multi-host replacement for the reference's
DistributedSampler+DDP input handling (/root/reference/train_cifar10.py:313-324).

Called both by the 2-process workers (tests/test_multihost.py) and by the
single-process oracle; results must agree.
"""
from __future__ import annotations

import numpy as np

T, B, RES = 4, 16, 8
SEED = 11


def run_step():
    """Build the tiny trainer, run one full step. Returns (metrics dict of
    python floats, params checksum float)."""
    import jax
    import jax.numpy as jnp

    from dxmi_tpu.models.igebm import IGEBMEncoder
    from dxmi_tpu.models.unet_small import UNetSmall
    from dxmi_tpu.models.value import TimeIndependentValue
    from dxmi_tpu.parallel import (create_mesh, data_sharding, global_batch,
                                   replicate, sync_hosts)
    from dxmi_tpu.samplers.var import VARSampler
    from dxmi_tpu.trainers import buffer as buflib
    from dxmi_tpu.trainers.dxmi import DxMITrainer

    mesh = create_mesh()  # all global devices
    n_proc = jax.process_count()
    pid = jax.process_index()

    net = UNetSmall(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                    attn_resolutions=(8,), dropout=0.0, in_channels=3,
                    resolution=RES)
    sampler = VARSampler(net, n_timesteps=T, sample_shape=(3, RES, RES),
                         trainable_beta="fix_last")
    value = TimeIndependentValue(net=IGEBMEncoder(nh=16, keepdim=False,
                                                  learn_out_scale=True))
    trainer = DxMITrainer(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                          n_timesteps=T, use_sampler_beta=True,
                          adavelreg=0.99, time_cost=0.0, time_cost_sig=1.0)
    trainer.set_models(sampler, value, lr=1e-6, v_lr=1e-5, beta_lr=1e-5)

    key = jax.random.key(SEED)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    sp = sampler.init_params(k1)
    vp = value.init(k2, jnp.zeros((1, RES, RES, 3)),
                    jnp.zeros((1,), jnp.int32))["params"]
    state = trainer.init_state(sp, vp)
    state = replicate(mesh, state)

    # trajectory: identical replicated computation on every process, then
    # resharded onto the data axis (buffer layout (K, T, B, ...))
    d_sample = jax.jit(lambda p, k: sampler.sample(p, k, B))(
        state.sampler_params, k3)
    traj = buflib.from_d_sample(d_sample)

    def reshard(a):
        if a is None or getattr(a, "ndim", 0) < 3:
            return a
        sh = data_sharding(mesh, batch_axis_index=2, ndim=a.ndim)
        return jax.jit(lambda x: x, out_shardings=sh)(a)

    traj = jax.tree.map(reshard, traj)

    # the GLOBAL image batch is fixed by seed; each process contributes its
    # LOCAL slice through global_batch (multi-host input path under test)
    rng = np.random.default_rng(SEED)
    img_global = rng.normal(size=(B, RES, RES, 3)).astype(np.float32)
    per = B // n_proc
    img = global_batch(mesh, img_global[pid * per:(pid + 1) * per])

    state, m1 = trainer.update_f_v(state, img, traj, k4)
    state, m2 = trainer.update_sampler(state, traj, k5, n_generator=1)
    sync_hosts("test_multihost_step")

    metrics = {
        "d_loss": float(m1["ebm/d_loss_"]),
        "v_loss": float(m1["ebm/v_loss_"]),
        "sampler_loss": float(m2["sampler/sampler_loss_"]),
    }
    # params are replicated -> safe to fetch anywhere
    leaves = jax.tree.leaves(state.sampler_params)
    checksum = float(sum(jnp.mean(jnp.abs(l)).astype(jnp.float64)
                         for l in leaves))
    return metrics, checksum


def run_fid():
    """Multi-process generation + sharded FID statistics (reference flow:
    per-rank generation -> all_gather stats, /root/reference/
    train_image_large.py:39-88). Each process generates its OWN batch
    (key folded by rank), features are assembled into a globally
    data-sharded activation array, and the FID moments cross processes
    as GSPMD reductions (fid/stats.sharded_moments). Must equal the
    single-process oracle computing the same ranks' batches serially."""
    import jax
    import jax.numpy as jnp

    from dxmi_tpu.fid import stats as stats_lib
    from dxmi_tpu.models.unet_small import UNetSmall
    from dxmi_tpu.parallel import create_mesh, global_batch, sync_hosts
    from dxmi_tpu.samplers.var import VARSampler

    mesh = create_mesh()
    n_proc = jax.process_count()
    pid = jax.process_index()
    n_ranks = 2  # fixed logical rank count so single/multi agree

    net = UNetSmall(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                    attn_resolutions=(8,), dropout=0.0, in_channels=3,
                    resolution=RES)
    sampler = VARSampler(net, n_timesteps=T, sample_shape=(3, RES, RES),
                         trainable_beta="fix_last")
    sp = sampler.init_params(jax.random.key(SEED))
    key = jax.random.key(SEED + 1)
    gen = jax.jit(lambda p, k: sampler.sample(p, k, B)["sample"])

    def rank_acts(rank):
        x = gen(sp, jax.random.fold_in(key, rank))          # (B, H, W, C)
        return np.asarray(x, np.float32).reshape(B, -1)     # features

    if n_proc == 1:
        acts = np.concatenate([rank_acts(r) for r in range(n_ranks)])
        acts_global = jnp.asarray(acts)
    else:
        assert n_proc == n_ranks
        acts_global = global_batch(mesh, rank_acts(pid))
        sync_hosts("test_multihost_fid")

    n, s1, s2 = stats_lib.sharded_moments(acts_global)
    mu, sigma = stats_lib.stats_from_moments(n, s1, s2)

    # fixed comparison stats: seed-deterministic gaussian cloud
    rng = np.random.default_rng(SEED + 7)
    ref = rng.normal(size=(4 * B, mu.shape[0])).astype(np.float64)
    m2, c2 = stats_lib.activation_statistics(ref)
    fid = stats_lib.frechet_distance(mu, sigma, m2, c2)
    return {"fid": float(fid), "mu0": float(mu[0]),
            "tr_sigma": float(np.trace(sigma))}


def worker_main(process_id: int, num_processes: int, port: int, out: str,
                mode: str = "step"):
    """Entry for a spawned multi-host worker (CPU backend, 4 local devices)."""
    import json
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=4").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=num_processes,
                               process_id=process_id)
    assert jax.process_count() == num_processes
    assert jax.device_count() == 4 * num_processes
    if mode == "fid":
        payload = {"metrics": run_fid()}
    else:
        metrics, checksum = run_step()
        payload = {"metrics": metrics, "checksum": checksum}
    if jax.process_index() == 0:
        with open(out, "w") as fh:
            json.dump(payload, fh)
    jax.distributed.shutdown()


if __name__ == "__main__":
    import os as _os
    import sys

    sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    worker_main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
                sys.argv[4], sys.argv[5] if len(sys.argv) > 5 else "step")
