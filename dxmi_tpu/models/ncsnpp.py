"""NCSN++ generator with adaptive group norm and latent-z conditioning —
the DDGAN denoising generator.

The reference config targets ``models.ddgan.models.ncsnpp_generator_adagn
.NCSNpp`` with ``models.ddgan.NCSNppArgs`` defaults
(/root/reference/configs/cifar10/T4_ddgan.yaml:2-9), but the module is NOT
in the snapshot (SURVEY.md §2.0). This is a from-scratch reconstruction of
the documented DDGAN architecture (Xiao et al., ICLR 2022: score_sde
NCSN++ backbone + BigGAN resblocks + adaptive GroupNorm conditioned on a
mapped latent z), TPU-native (NHWC, FIR resampling as depthwise convs).

``__call__(x, t, z)`` -> denoised x0 prediction in [-1, 1] (tanh head).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.models.unet_small import _conv, timestep_embedding


@dataclasses.dataclass
class NCSNppArgs:
    """DDGAN CIFAR-10 generator hyperparameters (the published run's
    defaults)."""

    image_size: int = 32
    num_channels: int = 3
    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.0
    nz: int = 100
    z_emb_dim: int = 256
    n_mlp: int = 3
    skip_rescale: bool = True
    use_tanh: bool = True


_FIR_KERNEL = np.array([1.0, 3.0, 3.0, 1.0])


def _fir_filter_2d() -> np.ndarray:
    k = np.outer(_FIR_KERNEL, _FIR_KERNEL)
    return (k / k.sum()).astype(np.float32)


def fir_downsample(x: jnp.ndarray) -> jnp.ndarray:
    """StyleGAN2-style FIR antialiased 2x downsample as a depthwise conv."""
    C = x.shape[-1]
    k = jnp.asarray(_fir_filter_2d(), x.dtype)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, C))  # HWIO with feature_group_count=C
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(2, 2), padding=((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def fir_upsample(x: jnp.ndarray) -> jnp.ndarray:
    """FIR antialiased 2x upsample (zero-stuff then smooth; gain 4)."""
    B, H, W, C = x.shape
    up = jnp.zeros((B, H * 2, W * 2, C), x.dtype)
    up = up.at[:, ::2, ::2, :].set(x)
    k = jnp.asarray(_fir_filter_2d() * 4.0, x.dtype)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        up, k, window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def _num_groups(C: int) -> int:
    """score_sde convention: min(C // 4, 32) groups (divides C for all the
    channel counts this architecture produces)."""
    return max(min(C // 4, 32), 1)


class GN(nn.Module):
    """GroupNorm with the same param tree as ``nn.GroupNorm`` ('scale'/
    'bias') routed through ops/groupnorm.fused_group_norm, so the
    DXMI_GN_STATS statistics formulations (notably bf16_onepass — the
    +7%/+11% ADM sampling lever, PERF.md r4) reach the NCSN++/DDGAN
    path too.  Default mode is two-pass fp32 statistics (same accuracy
    class as flax's fp32-promoted one-pass; torch-parity tested)."""

    num_groups: int
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from dxmi_tpu.ops.groupnorm import fused_group_norm

        C = x.shape[-1]
        scale = (self.param("scale", nn.initializers.ones, (C,))
                 if self.use_scale else jnp.ones((C,), jnp.float32))
        bias = (self.param("bias", nn.initializers.zeros, (C,))
                if self.use_bias else jnp.zeros((C,), jnp.float32))
        return fused_group_norm(x, scale, bias, self.num_groups, 1e-6,
                                False)


class AdaGN(nn.Module):
    """GroupNorm whose affine params come from the z embedding
    (the 'adagn' in ncsnpp_generator_adagn).  Statistics honor
    DXMI_GN_STATS (fp32 two-pass default; in bf16 compute the
    bf16_onepass mode reads bf16 / accumulates fp32)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, zemb):
        C = h.shape[-1]
        h32 = GN(num_groups=_num_groups(C), use_scale=False,
                 use_bias=False, name="gn")(h).astype(self.dtype)
        film = nn.Dense(2 * C, dtype=self.dtype, name="film")(zemb)
        scale, shift = jnp.split(film, 2, axis=-1)
        return h32 * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]


class ResBlockBigGAN(nn.Module):
    out_channels: int
    up: bool = False
    down: bool = False
    dropout: float = 0.0
    skip_rescale: bool = True
    quant: Any = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, zemb, *, deterministic: bool = True):
        in_ch = x.shape[-1]
        h = AdaGN(dtype=self.dtype, name="norm1")(x, zemb)
        h = jax.nn.silu(h)
        if self.up:
            h = fir_upsample(h)
            x = fir_upsample(x)
        elif self.down:
            h = fir_downsample(h)
            x = fir_downsample(x)
        h = _conv(self.quant, self.out_channels, (3, 3), self.dtype,
                  "conv1")(h)
        h = h + nn.Dense(self.out_channels, dtype=self.dtype,
                         name="temb_proj")(
            jax.nn.silu(temb))[:, None, None, :]
        h = AdaGN(dtype=self.dtype, name="norm2")(h, zemb)
        h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = _conv(self.quant, self.out_channels, (3, 3), self.dtype, "conv2",
                  kernel_init=nn.initializers.zeros)(h)
        if in_ch != self.out_channels or self.up or self.down:
            x = _conv(self.quant, self.out_channels, (1, 1), self.dtype,
                      "shortcut", padding=0)(x)
        out = x.astype(h.dtype) + h
        return out / np.sqrt(2.0) if self.skip_rescale else out


class AttnBlockSkip(nn.Module):
    skip_rescale: bool = True
    quant: Any = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GN(num_groups=_num_groups(C), name="norm")(x)
        q = _conv(self.quant, C, (1, 1), self.dtype, "q",
                  padding=0)(h).reshape(B, H * W, C)
        k = _conv(self.quant, C, (1, 1), self.dtype, "k",
                  padding=0)(h).reshape(B, H * W, C)
        v = _conv(self.quant, C, (1, 1), self.dtype, "v",
                  padding=0)(h).reshape(B, H * W, C)
        w = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) * (C ** -0.5), axis=-1)
        h = jnp.einsum("bqk,bkc->bqc", w, v).reshape(B, H, W, C)
        h = _conv(self.quant, C, (1, 1), self.dtype, "proj_out", padding=0,
                  kernel_init=nn.initializers.zeros)(h)
        out = x.astype(h.dtype) + h
        return out / np.sqrt(2.0) if self.skip_rescale else out


class NCSNpp(nn.Module):
    """DDGAN generator: predicts x0 from (x_t, t, z).

    ``quant_int8``: False | True (dynamic ranges) | 'static' (calibrated
    ranges via ``DDGANSampler.calibrate_quant``) — W8A8 convs on the MXU
    for the res/attn blocks; conv_in/conv_out/pyramid stay fp (same
    policy as UNetSmall)."""

    config: NCSNppArgs = dataclasses.field(default_factory=NCSNppArgs)
    quant_int8: Any = False
    # keep the attention qkv/proj 1x1 convs in bf16 while the res blocks
    # run int8 (drift/throughput trade; same knob as UNetSmall)
    quant_skip_attn: bool = False
    # compute dtype for the torso (params stay fp32); fp32 default is
    # the parity setting, bf16 the measured TPU option (PERF.md r4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, z, *, deterministic: bool = True):
        cfg = self.config
        attn_quant = False if self.quant_skip_attn else self.quant_int8
        nf = cfg.nf
        temb_ch = nf * 4

        # z mapping network
        zemb = z.astype(self.dtype)
        for i in range(cfg.n_mlp):
            zemb = nn.Dense(cfg.z_emb_dim, dtype=self.dtype,
                            name=f"z_mlp_{i}")(zemb)
            zemb = jax.nn.silu(zemb)

        temb = timestep_embedding(t.astype(jnp.float32), nf)
        temb = nn.Dense(temb_ch, dtype=self.dtype,
                        name="temb_dense0")(temb.astype(self.dtype))
        temb = nn.Dense(temb_ch, dtype=self.dtype,
                        name="temb_dense1")(jax.nn.silu(temb))

        h = nn.Conv(nf, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        hs = [h]
        res = cfg.image_size
        input_pyramid = x
        for i_level, mult in enumerate(cfg.ch_mult):
            for i_block in range(cfg.num_res_blocks):
                h = ResBlockBigGAN(nf * mult, dropout=cfg.dropout, quant=self.quant_int8,
                                   dtype=self.dtype,
                                   skip_rescale=cfg.skip_rescale,
                                   name=f"down_{i_level}_block_{i_block}")(
                    h, temb, zemb, deterministic=deterministic)
                if res in cfg.attn_resolutions:
                    h = AttnBlockSkip(cfg.skip_rescale, quant=attn_quant,
                                      dtype=self.dtype,
                                      name=f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != len(cfg.ch_mult) - 1:
                h = ResBlockBigGAN(h.shape[-1], down=True, dropout=cfg.dropout, quant=self.quant_int8,
                                   dtype=self.dtype,
                                   skip_rescale=cfg.skip_rescale,
                                   name=f"down_{i_level}_downsample")(
                    h, temb, zemb, deterministic=deterministic)
                # progressive_input='residual' pyramid
                input_pyramid = fir_downsample(input_pyramid)
                pyr = nn.Conv(h.shape[-1], (1, 1), dtype=self.dtype,
                              name=f"pyramid_{i_level}")(
                    input_pyramid.astype(self.dtype))
                h = (h + pyr) / np.sqrt(2.0) if cfg.skip_rescale else h + pyr
                hs.append(h)
                res //= 2

        h = ResBlockBigGAN(h.shape[-1], dropout=cfg.dropout, quant=self.quant_int8,
                           dtype=self.dtype, skip_rescale=cfg.skip_rescale,
                           name="mid_block_1")(h, temb, zemb,
                                               deterministic=deterministic)
        h = AttnBlockSkip(cfg.skip_rescale, quant=attn_quant,
                          dtype=self.dtype, name="mid_attn")(h)
        h = ResBlockBigGAN(h.shape[-1], dropout=cfg.dropout, quant=self.quant_int8,
                           dtype=self.dtype, skip_rescale=cfg.skip_rescale,
                           name="mid_block_2")(h, temb, zemb,
                                               deterministic=deterministic)

        for i_level in reversed(range(len(cfg.ch_mult))):
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResBlockBigGAN(nf * cfg.ch_mult[i_level],
                                   dropout=cfg.dropout, quant=self.quant_int8,
                                   dtype=self.dtype,
                                   skip_rescale=cfg.skip_rescale,
                                   name=f"up_{i_level}_block_{i_block}")(
                    jnp.concatenate([h, hs.pop()], axis=-1), temb, zemb,
                    deterministic=deterministic)
                if res in cfg.attn_resolutions:
                    h = AttnBlockSkip(cfg.skip_rescale, quant=attn_quant,
                                      dtype=self.dtype,
                                      name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = ResBlockBigGAN(h.shape[-1], up=True, dropout=cfg.dropout, quant=self.quant_int8,
                                   dtype=self.dtype,
                                   skip_rescale=cfg.skip_rescale,
                                   name=f"up_{i_level}_upsample")(
                    h, temb, zemb, deterministic=deterministic)
                res *= 2
        assert not hs

        h = GN(num_groups=_num_groups(h.shape[-1]), name="norm_out")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(cfg.num_channels, (3, 3), padding=1,
                    name="conv_out")(h.astype(jnp.float32))
        return jnp.tanh(h) if cfg.use_tanh else h
