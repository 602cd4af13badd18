"""WideResNet value net (configs/lsun/T4_wide.yaml target; reconstructed —
the reference's models.wideresnet_te module is absent from the snapshot,
SURVEY.md §2.0)."""
import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.config import instantiate
from dxmi_tpu.models.wideresnet import WideResNet


def test_wideresnet_forward_shapes():
    net = WideResNet(depth=10, widen_factor=2, num_classes=1)
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    params = net.init(jax.random.key(1), x)
    out = net.apply(params, x)
    assert out.shape == (2, 1)
    assert np.isfinite(np.asarray(out)).all()
    # depth=10 -> n=1 block per group; all 3 groups materialize
    assert {"block1_0", "block2_0", "block3_0"} <= set(params["params"])


def test_wideresnet_via_config_alias():
    """The reference's stale class path (lsun/T4_wide.yaml:53) resolves
    through the alias table to our WideResNet."""
    cfg = {"_target_": "models.wideresnet_te.wideresnet.Wide_ResNet",
           "depth": 10, "widen_factor": 1, "norm": "group4",
           "num_classes": 1}
    net = instantiate(cfg)
    assert isinstance(net, WideResNet)
    x = jnp.zeros((1, 16, 16, 3))
    params = net.init(jax.random.key(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 1)


def test_wideresnet_time_independent_value_wrapper():
    """As used by the Cond trainer: TimeIndependentValue(net)(x, t) ignores
    t (reference models/value.py:3-15)."""
    from dxmi_tpu.models.value import TimeIndependentValue

    v = TimeIndependentValue(net=WideResNet(depth=10, widen_factor=1))
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    params = v.init(jax.random.key(1), x, jnp.zeros((2,), jnp.int32))
    a = v.apply(params, x, jnp.zeros((2,), jnp.int32))
    b = v.apply(params, x, jnp.full((2,), 3, jnp.int32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
