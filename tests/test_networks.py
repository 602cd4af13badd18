"""Network tests: shapes, determinism, and golden-value cross-checks of the
Flax networks against the reference PyTorch modules via weight conversion."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dxmi_tpu.models.unet_small import UNetSmall, UNetSmallEncoder, timestep_embedding
from dxmi_tpu.models.igebm import IGEBMEncoder
from dxmi_tpu.models.value import TimeIndependentValue
from dxmi_tpu.utils import convert
from tests.conftest import requires_reference

TINY = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
            attn_resolutions=(8,), dropout=0.0, in_channels=3, resolution=16)


def test_unet_small_shapes():
    model = UNetSmall(**TINY)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([0.5, 3.2])
    params = model.init(jax.random.key(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (2, 16, 16, 3)
    assert out.dtype == jnp.float32


def test_unet_small_dropout_rng():
    model = UNetSmall(**dict(TINY, dropout=0.5))
    x = jnp.ones((2, 16, 16, 3))
    t = jnp.array([1.0, 1.0])
    params = model.init(jax.random.key(0), x, t)
    a = model.apply(params, x, t, deterministic=True)
    b = model.apply(params, x, t, deterministic=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    c = model.apply(params, x, t, deterministic=False,
                    rngs={"dropout": jax.random.key(1)})
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_igebm_shapes():
    model = IGEBMEncoder(nh=16, keepdim=False, learn_out_scale=True)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 1)


def test_value_wrapper_ignores_t():
    v = TimeIndependentValue(net=IGEBMEncoder(nh=8, keepdim=False))
    x = jnp.ones((2, 32, 32, 3))
    params = v.init(jax.random.key(0), x, jnp.array([0, 0]))
    a = v.apply(params, x, jnp.array([0, 0]))
    b = v.apply(params, x, jnp.array([9, 9]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_unet_small_encoder_shapes():
    model = UNetSmallEncoder(**dict(TINY, out_ch=1))
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([1.0, 2.0])
    params = model.init(jax.random.key(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (2, 1)


@pytest.mark.slow
@requires_reference
class TestTorchParity:
    """Forward-pass parity vs the reference PyTorch modules with converted
    random weights (read-only import from the mounted snapshot)."""

    @pytest.fixture(scope="class")
    def ref_modules(self, reference_path):
        import sys
        sys.path.insert(0, str(reference_path))
        try:
            from models.DxMI import unet_small as ref_unet
            from models import modules as ref_modules_
        finally:
            sys.path.pop(0)
        return ref_unet, ref_modules_

    def test_timestep_embedding_parity(self, ref_modules):
        import torch
        ref_unet, _ = ref_modules
        t = np.array([0.0, 1.0, 617.33, 999.0], dtype=np.float32)
        ref = ref_unet.get_timestep_embedding(torch.from_numpy(t), 128).numpy()
        ours = np.asarray(timestep_embedding(jnp.asarray(t), 128))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_unet_small_forward_parity(self, ref_modules):
        import torch
        ref_unet, _ = ref_modules
        torch.manual_seed(0)
        tm = ref_unet.Model(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                            attn_resolutions=[8], dropout=0.0, in_channels=3,
                            resolution=16)
        tm.eval()

        x = np.random.RandomState(1).randn(2, 3, 16, 16).astype(np.float32)
        t = np.array([100.2, 617.0], dtype=np.float32)
        with torch.no_grad():
            ref_out = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()

        flax_params = convert.convert_unet_small(
            convert.torch_state_to_numpy(tm.state_dict()))
        model = UNetSmall(**TINY)
        ours = model.apply({"params": flax_params["params"]},
                           jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
        ours = np.asarray(ours).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)

    def test_unet_encoder_forward_parity(self, ref_modules):
        import torch
        ref_unet, _ = ref_modules
        torch.manual_seed(3)
        tm = ref_unet.UNetEncoder(ch=32, out_ch=1, ch_mult=(1, 2),
                                  num_res_blocks=1, attn_resolutions=[8],
                                  dropout=0.0, in_channels=3, resolution=16)
        tm.eval()
        x = np.random.RandomState(4).randn(2, 3, 16, 16).astype(np.float32)
        t = np.array([10.0, 400.0], dtype=np.float32)
        with torch.no_grad():
            ref_out = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()

        flax_params = convert.convert_unet_small_encoder(
            convert.torch_state_to_numpy(tm.state_dict()))
        model = UNetSmallEncoder(**dict(TINY, out_ch=1))
        ours = np.asarray(model.apply(
            {"params": flax_params["params"]},
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t)))
        np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)

    def test_igebm_forward_parity(self, ref_modules):
        import torch
        _, ref_mod = ref_modules
        torch.manual_seed(0)
        tm = ref_mod.IGEBMEncoderV2(in_chan=3, out_chan=1, use_spectral_norm=False,
                                    keepdim=False, out_activation="linear",
                                    learn_out_scale=True, nh=16)
        tm.eval()
        x = np.random.RandomState(2).randn(2, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            ref_out = tm(torch.from_numpy(x)).numpy()

        flax_params = convert.convert_igebm(
            convert.torch_state_to_numpy(tm.state_dict()))
        model = IGEBMEncoder(nh=16, keepdim=False, learn_out_scale=True)
        ours = np.asarray(model.apply(flax_params,
                                      jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)

    def test_igebm_spectral_norm_forward_parity(self, ref_modules):
        """Spectral-norm parametrized checkpoint conversion: torch stores
        (weight.original, _u, _v); flax re-derives sigma from u by one
        power-iteration step, so parity holds once u has converged (a few
        train-mode torch forwards)."""
        import torch
        _, ref_mod = ref_modules
        torch.manual_seed(5)
        tm = ref_mod.IGEBMEncoderV2(in_chan=3, out_chan=1,
                                    use_spectral_norm=True, keepdim=False,
                                    out_activation="linear", nh=16)
        x = np.random.RandomState(6).randn(2, 3, 32, 32).astype(np.float32)
        xt = torch.from_numpy(x)
        tm.train()
        with torch.no_grad():
            for _ in range(50):  # converge the power iteration
                tm(xt)
        tm.eval()
        with torch.no_grad():
            ref_out = tm(xt).numpy()

        variables = convert.convert_igebm(
            convert.torch_state_to_numpy(tm.state_dict()))
        assert "sn_stats" in variables
        model = IGEBMEncoder(nh=16, keepdim=False, use_spectral_norm=True)
        ours = np.asarray(model.apply(variables,
                                      jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=1e-4)


def test_igebm_spectral_norm_paths():
    """Spectral-norm variant: init creates 'sn_stats'; inference and
    power-iteration-updating applies both work. Trainer threading of
    sn_stats is covered in tests/test_spectral_norm_trainer.py."""
    m = IGEBMEncoder(nh=8, keepdim=False, use_spectral_norm=True)
    x = jnp.ones((2, 16, 16, 3))
    vs = m.init(jax.random.key(0), x)
    assert "sn_stats" in vs
    out = m.apply({"params": vs["params"], "sn_stats": vs["sn_stats"]}, x)
    assert out.shape == (2, 1)
    out2, upd = m.apply({"params": vs["params"], "sn_stats": vs["sn_stats"]},
                        x, update_sn_stats=True, mutable=["sn_stats"])
    assert out2.shape == (2, 1) and "sn_stats" in upd


def test_conv_taps_param_and_numeric_parity():
    """ops/conv_taps.Conv3x3Taps must be a drop-in for nn.Conv((3,3),
    padding=1): same param tree, same outputs (it is the recorded
    DXMI_CONV_TAPS experiment — PERF.md negative result #3)."""
    import flax.linen as nn

    from dxmi_tpu.ops.conv_taps import Conv3x3Taps

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16))
    conv = nn.Conv(24, (3, 3), padding=1)
    taps = Conv3x3Taps(24)
    params = conv.init(jax.random.key(1), x)
    np.testing.assert_allclose(np.asarray(conv.apply(params, x)),
                               np.asarray(taps.apply(params, x)),
                               atol=2e-5)


@pytest.mark.slow
@requires_reference
def test_torch_run_dir_loads_directly(reference_path, tmp_path):
    """A published-style torch run dir (sampler.pth holding
    {'state_dict', 'fid', 'epoch'}) loads through load_run_checkpoint
    with conversion + metadata — the reference run-dir contract works
    without a manual convert step."""
    import sys

    import torch

    sys.path.insert(0, str(reference_path))
    try:
        from models.DxMI import unet_small as ref_unet
    finally:
        sys.path.pop(0)

    from dxmi_tpu.utils import checkpoint as C

    torch.manual_seed(0)
    tm = ref_unet.Model(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                        attn_resolutions=[8], dropout=0.0, in_channels=3,
                        resolution=16)
    torch.save({"state_dict": tm.state_dict(), "fid": 3.25, "epoch": 7},
               tmp_path / "sampler.pth")

    payload, path = C.load_run_checkpoint(str(tmp_path), "sampler", "best",
                                          torch_kind="unet_small")
    assert path.endswith("sampler.pth")
    assert payload["meta"]["fid"] == 3.25 and payload["meta"]["epoch"] == 7
    p = payload["params"]
    net_tree = p["net"] if "net" in p else p
    # converted tree drives the flax net
    model = UNetSmall(**TINY)
    x = jnp.zeros((2, 16, 16, 3))
    out = model.apply({"params": net_tree}, x, jnp.zeros((2,)))
    assert out.shape == (2, 16, 16, 3)

    # a net with no converter errors out clearly
    with pytest.raises(SystemExit):
        C.load_run_checkpoint(str(tmp_path), "sampler", "best",
                              torch_kind=None)
