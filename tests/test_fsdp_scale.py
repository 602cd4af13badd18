"""FSDP at a memory-meaningful shape (VERDICT r3 weak #4 / task 5).

``parallel/fsdp.py``'s stated purpose is making the LSUN-526M-class
models + optimizer state fit by sharding them across chips (SURVEY.md
§2.1); until round 4 it was only exercised on toy nets where most
leaves fall under the 2^14 ``min_size`` and stay replicated.  This
heavy test shards a >=100M-parameter UNetADM + RAdam/Adam state over
the 8-device virtual mesh's ``fsdp`` axis, asserts the per-device
addressable bytes are ~total/8 (the SHARDING win, as opposed to the
buffer-donation win train_image_large's ``donate=True`` provides), and
runs one full Cond train step on the sharded state to prove the
sharded program compiles and executes.

Reference context: the LSUN path trains a 526M EDM UNet
(/root/reference/configs/lsun/T4.yaml, train_image_large.py:130-140)
on 4 GPUs with DDP replication — replication is exactly what this test
proves we do NOT need.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dxmi_tpu.models.igebm import IGEBMEncoder
from dxmi_tpu.models.unet_adm import UNetADM
from dxmi_tpu.models.value import TimeIndependentValue
from dxmi_tpu.parallel import replicate, shard_batch
from dxmi_tpu.parallel.fsdp import shard_params_fsdp
from dxmi_tpu.samplers.edm import EDMSampler, KarrasDenoiser
from dxmi_tpu.trainers import buffer as buflib
from dxmi_tpu.trainers.dxmi_cond import DxMITrainerCond

pytestmark = pytest.mark.heavy


def _bytes_total(tree) -> int:
    return sum(a.nbytes for a in jax.tree.leaves(tree))


def _bytes_per_device(tree) -> dict:
    """Addressable bytes per device id, from the actual shard layout."""
    per = {}
    for a in jax.tree.leaves(tree):
        for sh in a.addressable_shards:
            per[sh.device.id] = per.get(sh.device.id, 0) + sh.data.nbytes
    return per


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8-device mesh")
def test_fsdp_cond_step_at_scale():
    from jax.sharding import Mesh

    # all 8 devices on the fsdp axis — the memory-div claim under test
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(1, 8),
                ("data", "fsdp"))

    T, B, RES = 2, 4, 16
    # channel-heavy, spatially-small: >=100M params at CPU-feasible FLOPs
    net = UNetADM(image_size=RES, in_channels=3, model_channels=448,
                  out_channels=3, num_res_blocks=2,
                  attention_resolutions=(4,), dropout=0.0,
                  channel_mult=(1, 2, 2), num_heads=4,
                  use_scale_shift_norm=True, resblock_updown=True)
    sampler = EDMSampler(net, KarrasDenoiser(), n_timesteps=T,
                         sample_shape=(3, RES, RES),
                         trainable_beta="fix_last")
    value = TimeIndependentValue(net=IGEBMEncoder(nh=16, keepdim=False,
                                                  learn_out_scale=True))
    trainer = DxMITrainerCond(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                              n_timesteps=T, use_sampler_beta=True,
                              adavelreg=0.99, time_cost=0.0,
                              time_cost_sig=1.0, skip_sampler_tau=1,
                              value_grad_clip=True)
    trainer.set_models(sampler, value, lr=1e-6, v_lr=1e-5, beta_lr=1e-5)

    k = jax.random.split(jax.random.key(0), 5)
    sp = sampler.init_params(k[0])
    n_params = sum(int(np.prod(a.shape))
                   for a in jax.tree.leaves(sp["net"]))
    assert n_params >= 100e6, f"model too small: {n_params/1e6:.1f}M"

    vp = value.init(k[1], jnp.zeros((1, RES, RES, 3)),
                    jnp.zeros((1,), jnp.int32))["params"]

    # shard params FIRST (optax init's zeros_like then builds the
    # moments against sharded leaves), then give the optimizer state its
    # own fsdp layout: each RAdam/Adam moment shards exactly like its
    # parameter, counters/scalars replicate on the mesh
    sp = shard_params_fsdp(mesh, sp)
    state = trainer.init_state(sp, vp)
    state.opt_state_sampler = shard_params_fsdp(mesh,
                                                state.opt_state_sampler)
    # replicate only the small value-side/aux fields (a blanket
    # ``replicate`` would silently undo the fsdp layout under test)
    state.v_params = replicate(mesh, state.v_params)
    state.opt_state_v = replicate(mesh, state.opt_state_v)
    state.betas_for_q = replicate(mesh, state.betas_for_q)

    # --- the memory claim: params + both optimizer moments ~ total/8 ---
    big = {"params": state.sampler_params,
           "opt": state.opt_state_sampler}
    total = _bytes_total(big)
    per = _bytes_per_device(big)
    # the big leaves shard exactly once across devices; leaves under
    # fsdp's min_size (gn scales, biases, counters) replicate, so the
    # per-device sum exceeds `total` only by 7 extra copies of that
    # small replicated tail
    replicated_excess = sum(per.values()) - total
    assert 0 <= replicated_excess < 0.05 * total, replicated_excess
    worst = max(per.values())
    # >= 100M fp32 params + 2 RAdam moments ≈ 3 * 400MB; small replicated
    # leaves (gn scales, biases, log_betas, radam counters) give slack
    assert worst < total / 8 * 1.25, (
        f"per-device {worst/1e6:.0f}MB vs total {total/1e6:.0f}MB — "
        "FSDP sharding is not dividing memory")
    replicated_would_be = total  # per device, if DDP-style
    assert worst < replicated_would_be / 6

    # --- and the sharded state actually trains: one full Cond step ---
    d_sample = jax.jit(lambda p, kk: sampler.sample(p, kk, B))(
        state.sampler_params, k[2])
    traj = buflib.from_d_sample(d_sample)
    traj = jax.tree.map(
        lambda a: shard_batch(mesh, a, batch_axis_index=2)
        if a is not None and getattr(a, "ndim", 0) >= 3 else a, traj)
    img = shard_batch(mesh, jax.random.normal(k[3], (B, RES, RES, 3)))

    state, m1 = trainer.update_f_v(state, img, traj, k[4])
    state, m2 = trainer.update_sampler(state, traj, k[4])
    jax.block_until_ready((m1["ebm/d_loss_"], m2["sampler/sampler_loss_"]))
    assert np.isfinite(float(m1["ebm/d_loss_"]))
    assert np.isfinite(float(m2["sampler/sampler_loss_"]))

    # the update must PRESERVE the sharded layout (no silent re-replication
    # after step 1, or step 2's memory doubles)
    per_after = _bytes_per_device({"params": state.sampler_params,
                                   "opt": state.opt_state_sampler})
    assert max(per_after.values()) < total / 8 * 1.25
