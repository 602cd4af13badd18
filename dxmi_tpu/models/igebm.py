"""IGEBM-style convolutional energy/value encoder, TPU-native.

Capability parity with /root/reference/models/modules.py:28-180
(``ResBlockV2`` / ``IGEBMEncoderV2``): conv stem -> 6 leaky-ReLU residual
blocks (3 downsamples) -> ReLU -> spatial sum (or adaptive-avg) pool ->
linear head, with optional class embedding FiLM, optional spectral norm,
and an optional learned affine output scale.

NHWC layout; fp32 params, configurable compute dtype.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def leaky_relu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=slope)


class ResBlockEBM(nn.Module):
    """conv3 -> (class FiLM) -> lrelu -> conv3 -> (class FiLM) -> +skip ->
    (avgpool2 if downsample) -> lrelu (reference modules.py:28-101)."""

    out_channels: int
    n_class: Optional[int] = None
    downsample: bool = False
    use_spectral_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: Optional[jnp.ndarray] = None,
                 *, update_sn_stats: bool = False) -> jnp.ndarray:
        in_channels = x.shape[-1]
        use_bias = self.n_class is None

        def conv(name):
            c = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=use_bias,
                        dtype=self.dtype, name=name)
            if self.use_spectral_norm:
                c = nn.SpectralNorm(c, collection_name="sn_stats")
            return c

        def skip_conv():
            c = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name="skip")
            if self.use_spectral_norm:
                c = nn.SpectralNorm(c, collection_name="sn_stats")
            return c

        kw = dict(update_stats=update_sn_stats) if self.use_spectral_norm else {}

        out = conv("conv1")(x, **kw)

        if self.n_class is not None:
            # FiLM from a class embedding initialised to (scale=1, bias=0)
            # (reference modules.py:50-55)
            embed = nn.Embed(self.n_class, self.out_channels * 4,
                             embedding_init=_film_init(self.out_channels),
                             dtype=self.dtype, name="class_embed")(y)
            w1, w2, b1, b2 = jnp.split(embed, 4, axis=-1)
            out = w1[:, None, None, :] * out + b1[:, None, None, :]

        out = leaky_relu(out)
        out = conv("conv2")(out, **kw)

        if self.n_class is not None:
            out = w2[:, None, None, :] * out + b2[:, None, None, :]

        if in_channels != self.out_channels or self.downsample:
            skip = skip_conv()(x, **kw)
        else:
            skip = x
        out = out + skip

        if self.downsample:
            out = nn.avg_pool(out, (2, 2), strides=(2, 2))
        return leaky_relu(out)


def _film_init(out_channels: int):
    def init(key, shape, dtype=jnp.float32):
        emb = jnp.zeros(shape, dtype)
        return emb.at[:, : out_channels * 2].set(1.0)
    return init


class IGEBMEncoder(nn.Module):
    """``__call__(x_nhwc[, y]) -> (B, out_chan)`` energy/value head
    (reference modules.py:104-163)."""

    in_chan: int = 3
    out_chan: int = 1
    n_class: Optional[int] = None
    use_spectral_norm: bool = False
    keepdim: bool = True
    out_activation: str = "linear"
    avg_pool_dim: int = 1
    learn_out_scale: bool = False
    nh: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: Optional[jnp.ndarray] = None,
                 *, update_sn_stats: bool = False) -> jnp.ndarray:
        nh = self.nh
        x = x.astype(self.dtype)

        conv1 = nn.Conv(nh, (3, 3), padding=1, dtype=self.dtype, name="conv1")
        if self.use_spectral_norm:
            conv1 = nn.SpectralNorm(conv1, collection_name="sn_stats")
            out = conv1(x, update_stats=update_sn_stats)
        else:
            out = conv1(x)
        out = leaky_relu(out)

        specs = [
            (nh, True), (nh, False),
            (nh * 2, True), (nh * 2, False),
            (nh * 2, True), (nh * 2, False),
        ]
        for i, (ch, down) in enumerate(specs):
            out = ResBlockEBM(ch, self.n_class, downsample=down,
                              use_spectral_norm=self.use_spectral_norm,
                              dtype=self.dtype, name=f"block_{i}")(
                out, y, update_sn_stats=update_sn_stats)

        out = jax.nn.relu(out).astype(jnp.float32)
        if self.keepdim:
            # adaptive average pool to (avg_pool_dim, avg_pool_dim) then 1x1 conv
            B, H, W, C = out.shape
            d = self.avg_pool_dim
            out = out.reshape(B, d, H // d, d, W // d, C).mean(axis=(2, 4))
            out = nn.Conv(self.out_chan, (1, 1), dtype=jnp.float32, name="linear")(out)
            out = out.reshape(B, -1)
        else:
            out = out.sum(axis=(1, 2))  # spatial sum pool (modules.py:154)
            out = nn.Dense(self.out_chan, dtype=jnp.float32, name="linear")(out)

        if self.learn_out_scale:
            out = nn.Dense(1, dtype=jnp.float32, name="out_scale")(out)

        if self.out_activation == "linear":
            return out
        if self.out_activation == "relu":
            return jax.nn.relu(out)
        if self.out_activation == "sigmoid":
            return jax.nn.sigmoid(out)
        if self.out_activation == "softplus":
            return jax.nn.softplus(out)
        if self.out_activation == "tanh":
            return jnp.tanh(out)
        if self.out_activation == "swish":
            return jax.nn.silu(out)
        if self.out_activation == "leakyrelu":
            return leaky_relu(out)
        raise ValueError(f"unknown out_activation: {self.out_activation}")
