"""Mesh/sharding tests: FSDP param sharding correctness and the full
dryrun contract on the 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from dxmi_tpu.parallel import create_mesh, shard_batch
from dxmi_tpu.parallel.fsdp import fsdp_sharding_for, shard_params_fsdp


def test_fsdp_sharding_specs():
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "fsdp"))
    big = jnp.zeros((256, 128))
    small = jnp.zeros((7,))
    odd = jnp.zeros((3, 5, 7))  # nothing divisible by 2... 3,5,7 all odd

    s_big = fsdp_sharding_for(mesh, big)
    assert s_big.spec == jax.sharding.PartitionSpec("fsdp", None)
    s_small = fsdp_sharding_for(mesh, small)
    assert s_small.spec == jax.sharding.PartitionSpec()
    s_odd = fsdp_sharding_for(mesh, odd, min_size=1)
    assert s_odd.spec == jax.sharding.PartitionSpec()


def test_fsdp_compute_equivalence():
    """A jitted matmul over fsdp-sharded params equals the replicated one."""
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "fsdp"))
    w = jax.random.normal(jax.random.key(0), (128, 64))
    x = jax.random.normal(jax.random.key(1), (16, 128))

    f = jax.jit(lambda w, x: x @ w)
    ref = f(w, x)
    w_sh = shard_params_fsdp(mesh, {"w": w}, min_size=1)["w"]
    x_sh = shard_batch(mesh, x)
    out = f(w_sh, x_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=1e-5)


def test_sharded_generation_matches_single_device():
    """Sampling jitted with a data-sharded output (the generate entries'
    SPMD path) is bitwise identical to the unsharded program and actually
    lands sharded across the mesh."""
    import jax.numpy as jnp

    from dxmi_tpu.models.unet_small import UNetSmall
    from dxmi_tpu.parallel import create_mesh, data_sharding
    from dxmi_tpu.samplers.var import VARSampler

    net = UNetSmall(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                    attn_resolutions=(8,), dropout=0.0, in_channels=3,
                    resolution=16)
    s = VARSampler(net, n_timesteps=4, sample_shape=(3, 16, 16),
                   trainable_beta="fix_last")
    params = s.init_params(jax.random.key(0))
    mesh = create_mesh()
    assert mesh.devices.size == 8

    k = jax.random.key(3)
    ref = jax.jit(lambda kk: s.sample(params, kk, 16)["sample"])(k)
    sh = jax.jit(lambda kk: s.sample(params, kk, 16)["sample"],
                 out_shardings=data_sharding(mesh))(k)
    assert len(sh.sharding.device_set) == 8
    # threefry is sharding-invariant (jax_threefry_partitionable), so the
    # only difference is partitioning-dependent fusion rounding (~1e-6)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_dryrun_multichip_contract():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
