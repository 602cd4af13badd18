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


def test_cond_data_parallel_both_phases():
    """Cond trainer (EDM policy, class-conditional) under a data-sharded
    batch on the 8-device mesh equals the single-device result for BOTH
    update phases (psum-of-grads == full-batch grads; SURVEY.md §4's
    distributed-equivalence seam for the large-image path)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dxmi_tpu.models.igebm import IGEBMEncoder
    from dxmi_tpu.models.value import TimeIndependentValue
    from dxmi_tpu.samplers.edm import EDMSampler
    from dxmi_tpu.trainers import buffer as buflib
    from dxmi_tpu.trainers.dxmi_cond import DxMITrainerCond
    from tests.test_edm_sampler import ConstNet

    T, B, RES = 4, 16, 8
    s = EDMSampler(ConstNet(), None, n_timesteps=T,
                   sample_shape=(3, RES, RES), class_cond=True,
                   num_classes=10, trainable_beta="fix_last")
    value = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False))
    tr = DxMITrainerCond(batchsize=B, tau1=0.1, tau2=0.01, gamma=1.0,
                         n_timesteps=T, use_sampler_beta=True,
                         adavelreg=0.99, time_cost=0.0, time_cost_sig=1.0)
    tr.set_models(s, value, lr=1e-4, v_lr=1e-4, beta_lr=1e-4)
    sp = s.init_params(jax.random.key(0))
    vp = value.init(jax.random.key(1), jnp.zeros((1, RES, RES, 3)),
                    jnp.zeros((1,), jnp.int32))["params"]
    state = tr.init_state(sp, vp)

    d = s.sample(sp, jax.random.key(2), B)
    traj = buflib.from_d_sample(d)
    img = jax.random.normal(jax.random.key(3), (B, RES, RES, 3))
    y = jax.random.randint(jax.random.key(4), (B,), 0, 10)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def shard_traj(a):
        if a is None:
            return None
        # buffer layout (K, T, B, ...) for trajectories, (K, B) for labels
        spec = P(None, None, "data") if a.ndim >= 3 else P(None, "data")
        return jax.device_put(a, NamedSharding(mesh, spec))

    traj_sh = jax.tree.map(shard_traj, traj)
    img_sh = jax.device_put(img, NamedSharding(mesh, P("data")))
    y_sh = jax.device_put(y, NamedSharding(mesh, P("data")))

    s_ref, m_ref = tr.update_f_v(state, img, traj, jax.random.key(5), y=y)
    s_sh, m_sh = tr.update_f_v(state, img_sh, traj_sh, jax.random.key(5),
                               y=y_sh)
    np.testing.assert_allclose(float(m_ref["ebm/d_loss_"]),
                               float(m_sh["ebm/d_loss_"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s_ref.v_params)[0]),
        np.asarray(jax.tree.leaves(s_sh.v_params)[0]), rtol=2e-3, atol=1e-6)

    p_ref, mp_ref = tr.update_sampler(s_ref, traj, jax.random.key(6),
                                      n_generator=None)
    p_sh, mp_sh = tr.update_sampler(s_sh, traj_sh, jax.random.key(6),
                                    n_generator=None)
    np.testing.assert_allclose(float(mp_ref["sampler/sampler_loss_"]),
                               float(mp_sh["sampler/sampler_loss_"]),
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(p_ref.sampler_params["log_betas"]),
        np.asarray(p_sh.sampler_params["log_betas"]), rtol=1e-4, atol=1e-7)


def test_ev_data_parallel_update_f_v():
    """EV trainer (separate energy+value) under a data-sharded batch on
    the 8-device mesh equals single-device (completes the SPMD-equivalence
    coverage for all three trainer variants)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dxmi_tpu.models.igebm import IGEBMEncoder
    from dxmi_tpu.models.value import TimeIndependentValue
    from dxmi_tpu.samplers.var import VARSampler
    from dxmi_tpu.trainers import buffer as buflib
    from dxmi_tpu.trainers.dxmi_ev import DxMITrainerEV
    from tests.test_ev_trainer import TinyEps

    T, B, RES = 4, 16, 8
    sampler = VARSampler(TinyEps(), n_timesteps=T, sample_shape=(3, RES, RES),
                         trainable_beta=True)
    value = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False))
    energy = IGEBMEncoder(nh=8, keepdim=False)
    tr = DxMITrainerEV(batchsize=B, tau1=0.1, tau2=0.01, n_timesteps=T,
                       use_sampler_beta=True, adavelreg=0.99)
    tr.set_models(sampler, value, energy, lr=1e-4, v_lr=1e-4, f_lr=1e-4,
                  beta_lr=1e-4)
    sp = sampler.init_params(jax.random.key(0))
    x0 = jnp.zeros((1, RES, RES, 3))
    vp = value.init(jax.random.key(1), x0,
                    jnp.zeros((1,), jnp.int32))["params"]
    fp = energy.init(jax.random.key(2), x0)["params"]
    state = tr.init_state_ev(sp, vp, fp)

    d = sampler.sample(sp, jax.random.key(3), B)
    traj = buflib.from_d_sample(d)
    img = jax.random.normal(jax.random.key(4), (B, RES, RES, 3))

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def shard(a):
        if a is None:
            return None
        spec = P(None, None, "data") if a.ndim >= 3 else P(None, "data")
        return jax.device_put(a, NamedSharding(mesh, spec))

    traj_sh = jax.tree.map(shard, traj)
    img_sh = jax.device_put(img, NamedSharding(mesh, P("data")))

    s_ref, m_ref = tr.update_f_v(state, img, traj, jax.random.key(5))
    s_sh, m_sh = tr.update_f_v(state, img_sh, traj_sh, jax.random.key(5))
    np.testing.assert_allclose(float(m_ref["ebm/d_loss_"]),
                               float(m_sh["ebm/d_loss_"]), rtol=1e-4)
    for lhs, rhs in zip(jax.tree.leaves(s_ref.f_params),
                        jax.tree.leaves(s_sh.f_params)):
        # atol covers fp32 psum reduction-order noise on near-zero leaves
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   rtol=2e-3, atol=1e-5)


def test_tp_sharding_specs():
    """Megatron pairing: conv1/qkv column (Cout), conv2/proj_out row
    (Cin); GN params replicated; column biases sharded."""
    from jax.sharding import PartitionSpec as P

    from dxmi_tpu.parallel.tp import tp_sharding_tree

    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "fsdp", "model"))
    params = {
        "block": {
            "conv1": {"kernel": jnp.zeros((3, 3, 64, 128)),
                      "bias": jnp.zeros((128,))},
            "conv2": {"kernel": jnp.zeros((3, 3, 128, 64)),
                      "bias": jnp.zeros((64,))},
            "norm1": {"gn": {"scale": jnp.zeros((64,)),
                             "bias": jnp.zeros((64,))}},
        },
        "attn": {
            "qkv": {"kernel": jnp.zeros((1, 1, 64, 192))},
            "proj_out": {"kernel": jnp.zeros((1, 1, 64, 64))},
        },
    }
    tree = tp_sharding_tree(mesh, params, fsdp_axis="fsdp", min_size=1)
    assert tree["block"]["conv1"]["kernel"].spec == P(
        None, None, "fsdp", "model")
    assert tree["block"]["conv1"]["bias"].spec == P("model")
    assert tree["block"]["conv2"]["kernel"].spec == P(
        None, None, "model", "fsdp")
    assert tree["block"]["conv2"]["bias"].spec == P()
    assert tree["block"]["norm1"]["gn"]["scale"].spec == P()
    assert tree["attn"]["qkv"]["kernel"].spec == P(None, None, "fsdp",
                                                   "model")
    assert tree["attn"]["proj_out"]["kernel"].spec == P(
        None, None, "model", "fsdp")


@pytest.mark.heavy
def test_tp_forward_and_grad_equivalence():
    """UNetSmall forward + input-grad under 2-D TPxFSDP param sharding on
    a (data,fsdp,model) mesh matches the replicated program."""
    from dxmi_tpu.models.unet_small import UNetSmall
    from dxmi_tpu.parallel import shard_batch, shard_params_tp

    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "fsdp", "model"))
    net = UNetSmall(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                    attn_resolutions=(8,), dropout=0.0, in_channels=3,
                    resolution=16)
    x = jax.random.normal(jax.random.key(1), (8, 16, 16, 3))
    t = jnp.zeros((8,), jnp.int32)
    params = net.init(jax.random.key(0), x, t)["params"]

    def loss(p, x):
        return jnp.mean(net.apply({"params": p}, x, t) ** 2)

    f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    ref_l, (ref_gp, ref_gx) = f(params, x)

    p_sh = shard_params_tp(mesh, params, fsdp_axis="fsdp", min_size=1)
    out_l, (out_gp, out_gx) = f(p_sh, shard_batch(mesh, x))
    np.testing.assert_allclose(float(out_l), float(ref_l), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out_gx), np.asarray(ref_gx),
                               rtol=2e-4, atol=1e-5)
    gp_err = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), out_gp, ref_gp)
    assert max(jax.tree.leaves(gp_err)) < 1e-4
