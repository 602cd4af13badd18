"""FID InceptionV3 feature extractor in Flax.

Architecture parity with /root/reference/pytorch_fid/inception.py (the
TF-ported FID Inception): bilinear resize to 299, [0,1] -> [-1,1]
normalisation, and the FID-specific block patches — InceptionA/C/E_1 use
average pooling that EXCLUDES padding, InceptionE_2 (the final block) uses
max pooling in its pool branch (inception.py:212-329).

TPU-native design: the network is inference-only here, so BatchNorms are
FOLDED into the preceding convs at weight-load time
(``load_fid_inception_params``) — the compiled graph is pure
conv+ReLU+pool, which XLA fuses tightly. Weights load from the published
``pt_inception-2015-12-05.pth`` (torch format) or an ``.npz`` re-pack;
no download is attempted (zero-egress environment).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBN(nn.Module):
    """Conv with folded BN -> bias; followed by ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "VALID"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=True)(x)
        return jax.nn.relu(x)


def _avg_pool_nopad_count(x, window=3, stride=1, pad=1):
    """3x3 stride-1 average pool with count_include_pad=False (the FID
    patch, pytorch_fid/inception.py:224-235)."""
    return nn.avg_pool(x, (window, window), strides=(stride, stride),
                       padding=((pad, pad), (pad, pad)),
                       count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nopad_count(x)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nopad_count(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # 'avg' (Mixed_7b) or 'max' (Mixed_7c, FID patch)

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)

        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)

        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)

        if self.pool_mode == "avg":
            bp = _avg_pool_nopad_count(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """``__call__(x01_nhwc)`` -> (B, 2048) pool3 activations.

    Input: float images in [0, 1], any spatial size (bilinearly resized to
    299, matching pytorch_fid's resize_input, inception.py:129-152).
    """

    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, 299, 299, C), method="bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0

        x = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)
        return x


# ---------------------------------------------------------------------------
# weight loading (BN folding)
# ---------------------------------------------------------------------------

BN_EPS = 1e-3  # torchvision InceptionV3 BatchNorm eps


def fold_bn(conv_w: np.ndarray, gamma, beta, mean, var,
            eps: float = BN_EPS) -> Tuple[np.ndarray, np.ndarray]:
    """Fold inference BN into the conv: W' = W * g/s, b' = beta - mean*g/s."""
    scale = gamma / np.sqrt(var + eps)
    w = conv_w * scale[:, None, None, None]  # (O, I, kh, kw)
    b = beta - mean * scale
    return w, b


def load_fid_inception_params(path: str) -> Dict[str, Any]:
    """Build the InceptionV3FID param tree from the published FID weights
    (``pt_inception-2015-12-05.pth`` torch file or an npz re-pack with the
    same key names)."""
    if path.endswith(".npz"):
        state = dict(np.load(path))
    else:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(raw, "state_dict"):
            raw = raw.state_dict()
        state = {k: v.numpy() for k, v in raw.items()}

    params: Dict[str, Any] = {}
    # group keys by conv module prefix
    prefixes = sorted({k.rsplit(".conv.weight", 1)[0]
                       for k in state if k.endswith(".conv.weight")})
    for prefix in prefixes:
        w = np.asarray(state[f"{prefix}.conv.weight"], np.float32)
        gamma = np.asarray(state[f"{prefix}.bn.weight"], np.float32)
        beta = np.asarray(state[f"{prefix}.bn.bias"], np.float32)
        mean = np.asarray(state[f"{prefix}.bn.running_mean"], np.float32)
        var = np.asarray(state[f"{prefix}.bn.running_var"], np.float32)
        w, b = fold_bn(w, gamma, beta, mean, var)
        kernel = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO

        # torch path 'Mixed_5b.branch1x1' -> flax ('Mixed_5b','branch1x1','Conv_0')
        parts = prefix.split(".")
        node = params
        for p in parts:
            node = node.setdefault(p, {})
        node["Conv_0"] = {"kernel": kernel, "bias": b}
    return params


def random_fid_inception_params(key) -> Dict[str, Any]:
    """Randomly-initialised params (tests / environments without the
    published weights — FID values are then NOT comparable, only the
    pipeline shape).

    Kernels are He-rescaled (flax's lecun_normal default halves activation
    variance at every ReLU; through ~94 convs the pool3 features collapse
    to ~2e-4 std and every Frechet distance degenerates to 0). With the
    sqrt(2) gain the random network keeps healthy per-dim variance, which
    makes it usable as a CONSISTENT random-feature comparator (relative
    A/Bs only, still not comparable to published FID numbers)."""
    model = InceptionV3FID()
    x = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(model.init)(key, x)["params"]

    def he(path, leaf):
        if path[-1].key == "kernel":
            return leaf * jnp.sqrt(2.0)
        return leaf

    return jax.tree_util.tree_map_with_path(he, params)
