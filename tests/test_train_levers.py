"""--fast_levers / auto-chunk wiring in train_cifar10.build (the r4
train-step levers: PERF.md round-4 ledger)."""
import jax.numpy as jnp

from dxmi_tpu import config as cfglib


def _cfg(batch=128):
    cfg = cfglib.merge(cfglib.load_yaml("configs/cifar10/T10.yaml"),
                       cfglib.load_yaml("configs/cifar10/cifar10.yaml"))
    cfg["training"]["batchsize"] = batch
    return cfg


def test_build_levers_overrides_and_chunking():
    import train_cifar10 as tc

    overrides = dict(dtype=jnp.bfloat16, softmax_f32=False,
                     softmax_nomax=True, up_impl="phase")
    sampler, value, trainer = tc.build(_cfg(), overrides,
                                       dict(dtype=jnp.bfloat16))
    net = sampler.net
    assert net.dtype == jnp.bfloat16
    assert value.net.dtype == jnp.bfloat16
    assert net.softmax_nomax and not net.softmax_f32
    assert net.up_impl == "phase"
    # bf16 levers pair with 64-chunks (199.6 vs 205.8 ms measured)
    assert trainer.sample_chunks == 2


def test_build_parity_defaults_and_chunking():
    import train_cifar10 as tc

    sampler, _, trainer = tc.build(_cfg())
    assert sampler.net.dtype == jnp.float32
    assert sampler.net.up_impl == "resize"
    # fp32 parity step pairs with 32-chunks (241.9 vs 248.0 ms measured)
    assert trainer.sample_chunks == 4
    # a config pin wins over the auto-pick
    cfg = _cfg()
    cfg["trainer"]["sample_chunks"] = 1
    _, _, tr2 = tc.build(cfg)
    assert tr2.sample_chunks == 1
