"""ADM / consistency-models U-Net, TPU-native.

Capability parity with /root/reference/models/cm/unet.py (``UNetModel``):
FiLM (scale-shift) GroupNorm conditioning, resblock up/downsampling,
multi-head QKV attention at selected downsample rates, class embedding,
zero-initialised output convs.

TPU-first design decisions:
  * NHWC + fp32 params / configurable bf16 compute dtype. This replaces
    the reference's manual fp16 stack (convert_to_fp16, master-param
    copies, dynamic loss scaling — cm/fp16_util.py) with bf16, which needs
    none of it.
  * Attention is one einsum pair per block with fp32 softmax. The
    reference's "legacy" path force-casts QKV to fp16 (cm/unet.py:423) —
    a GPU flash-attn compatibility quirk we deliberately normalise away.
  * Optional gradient checkpointing via ``nn.remat`` on ResBlocks
    (the reference's CheckpointFunction, cm/nn.py:140-186).

Module names mirror the torch state-dict paths (``input_blocks_1_0`` etc.)
so checkpoint conversion (utils/convert.convert_unet_adm) is mechanical.
"""
from __future__ import annotations

import math
import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.ops import trig
from dxmi_tpu.ops.attention import flash_available, flash_mha
from dxmi_tpu.ops.attn_block import (fused_attn_available, fused_attn_block,
                                     fused_attn_block_int8,
                                     fused_attn_block_train,
                                     fused_attn_bwd_available)


def adm_timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """ADM sinusoidal embedding: freq base i/half, concat(cos, sin) —
    NOTE ordering differs from the DDPM variant (cm/nn.py:119-137)."""
    half = dim // 2
    exponents = np.arange(half, dtype=np.float32) * np.float32(-math.log(max_period) / half)
    freqs = jnp.asarray(np.exp(exponents.astype(np.float64)).astype(np.float32))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    # accurate large-argument trig (see dxmi_tpu/ops/trig.py); |rescaled_t|
    # reaches ~1550 on the EDM sigma grid
    r = trig.reduce_mod_2pi(args)
    emb = jnp.concatenate([jnp.cos(r), jnp.sin(r)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GroupNormADM(nn.Module):
    """fp32 GroupNorm(32) (the reference's GroupNorm32, cm/nn.py:19-21),
    backed by the fused Pallas kernel on TPU; ``silu=True`` folds the
    following SiLU into the same pass."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, silu: bool = False):
        from dxmi_tpu.models.unet_small import _GNParams

        return _GNParams(32, self.eps, silu, name="gn")(x).astype(self.dtype)


def zeros_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class ResBlockADM(nn.Module):
    """GN-SiLU-conv / emb-FiLM / GN-SiLU-drop-zeroconv residual block with
    optional in-block resampling (cm/unet.py:147-260).

    ``quant``: run the two 3x3 convs (the block's FLOPs) as int8 W8A8
    (dxmi_tpu/ops/quant.py); 'static' uses calibrated activation scales
    from the 'quant_scales' collection. Skip/attention 1x1 convs stay
    full precision (cheap; drift control)."""

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32
    quant: object = False
    # 'phase' computes the up-block's conv3x3(nearest_up2(.)) via the
    # phase decomposition (ops/phase_up.py: 2.25x fewer MACs, no 4x
    # intermediate) and runs skip_connection on the SMALL grid
    # (conv1x1 commutes with nearest-up exactly). Param tree identical.
    up_impl: str = "resize"

    def _conv3(self, name, kernel_init=None):
        if self.quant:
            from dxmi_tpu.ops.quant import QConv

            return QConv(self.out_channels, (3, 3), padding=1,
                         dtype=self.dtype,
                         static_act=(self.quant == "static"),
                         kernel_init=kernel_init, name=name)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype,
                       kernel_init=kernel_init or nn.initializers.lecun_normal(),
                       name=name)

    @nn.compact
    def __call__(self, x, emb, *, deterministic: bool = True):
        in_ch = x.shape[-1]
        h = GroupNormADM(dtype=self.dtype, name="in_layers_0")(x, silu=True)
        skip_done = False
        if self.up and self.up_impl == "phase":
            from dxmi_tpu.models.unet_small import _ConvHolder
            from dxmi_tpu.ops.phase_up import conv3x3_nearest_up2
            from dxmi_tpu.ops.quant import calib_channel_scale

            k, b = _ConvHolder(self.out_channels, (3, 3),
                               name="in_layers_2")(in_ch)
            act_scale = None
            if self.quant == "static":
                scale_var = self.variable(
                    "quant_scales", "act_scale",
                    lambda: jnp.zeros((in_ch,), jnp.float32))
                if self.is_mutable_collection("quant_scales"):
                    scale_var.value = jnp.maximum(
                        scale_var.value,
                        calib_channel_scale(h.reshape(-1, in_ch)))
                else:
                    act_scale = scale_var.value
            h = conv3x3_nearest_up2(h, k, b, self.dtype, act_scale)
            # residual branch: 1x1 conv commutes with nearest-up —
            # run it on the small grid (4x fewer MACs), then upsample
            if in_ch != self.out_channels:
                x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name="skip_connection")(x)
                skip_done = True
            x = _upsample2x(x)
        else:
            if self.up:
                h = _upsample2x(h)
                x = _upsample2x(x)
            elif self.down:
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            h = self._conv3("in_layers_2")(h)

        emb_ch = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        emb_out = nn.Dense(emb_ch, dtype=self.dtype,
                           name="emb_layers_1")(jax.nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNormADM(dtype=self.dtype, name="out_layers_0")(h)
            h = h * (1 + scale) + shift
        else:
            h = h + emb_out
            h = GroupNormADM(dtype=self.dtype, name="out_layers_0")(h)
        # (scale-shift keeps GN and SiLU separate — FiLM sits between)
        h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = self._conv3("out_layers_3", kernel_init=zeros_init)(h)

        if in_ch != self.out_channels and not skip_done:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="skip_connection")(x)
        return x + h


def _upsample2x(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")


class AttentionBlockADM(nn.Module):
    """Multi-head self-attention over the flattened map
    (cm/unet.py:263-378; QKV channel layout = heads-outer, matching the
    legacy rearrange for weight-conversion compatibility)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    # fp32 softmax matches the reference's fp32 path; its fp16 mode
    # softmaxes in HALF with no upcast (QKVAttentionLegacy casts qkv,
    # cm/unet.py:423), so bf16 softmax is the fp16-mode parity setting
    # AND the measured-faster TPU option (PERF.md: +47% ImageNet64)
    softmax_f32: bool = True
    # 'einsum' = two XLA matmuls with materialized logits (reference
    # semantics); 'flash' = Pallas TPU flash kernel for maps where it
    # measures faster (ops/attention.py), einsum elsewhere; 'fused' = the
    # whole block (GN+qkv+MHA+proj+residual) as ONE Pallas kernel
    # (ops/attn_block.py) where its gate admits the shape, degrading to
    # flash/einsum elsewhere; 'fused_train' = the fused kernel with its
    # REAL pallas backward (fused_attn_block_train — dx + all parameter
    # cotangents in one kernel), for training steps that differentiate
    # through the block (degrades identically).
    attn_impl: str = "einsum"
    # 'static' + attn_impl='fused': W8A8 qkv/proj epilogues INSIDE the
    # fused kernel (ops/attn_block.fused_attn_block_int8) with calibrated
    # per-input-channel activation scales recorded in 'quant_scales'
    # ('attn_act_scale' for post-GN, 'attn_proj_scale' for the attention
    # output); the attention core stays bf16 (quantizing it loses at
    # every shape measured, PERF.md rounds 1-3).
    quant: object = False

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        S = H * W
        nh = self.num_heads
        d = C // nh
        sa_q = sa_p = None
        calibrating = False
        train_bwd = (self.attn_impl == "fused_train"
                     and fused_attn_bwd_available(S, C, nh))
        # the int8 kernel's half-size weight mats admit C=1024 (LSUN's
        # 16^2/8^2 maps) — measured 20.18 vs 19.94 img/s (PERF.md r5)
        if (self.attn_impl == "fused"
                and fused_attn_available(S, C, nh,
                                         int8=self.quant == "static")
                ) or train_bwd:
            q_static = self.quant == "static" and not train_bwd
            if q_static:
                sa_q = self.variable("quant_scales", "attn_act_scale",
                                     lambda: jnp.zeros((C,), jnp.float32))
                sa_p = self.variable("quant_scales", "attn_proj_scale",
                                     lambda: jnp.zeros((C,), jnp.float32))
                calibrating = self.is_mutable_collection("quant_scales")
            if not calibrating:
                from dxmi_tpu.models.unet_small import _ConvHolder, _GNHolder

                gs, gb = _GNHolder(name="norm")(C)
                kqkv, bqkv = _ConvHolder(3 * C, (1, 1), name="qkv")(C)
                kproj, bproj = _ConvHolder(C, (1, 1), kernel_init=zeros_init,
                                           name="proj_out")(C)
                xs = x.reshape(B, S, C).astype(self.dtype)
                if q_static:
                    y = fused_attn_block_int8(
                        xs, gs, gb, kqkv.reshape(C, 3 * C), bqkv,
                        kproj.reshape(C, C), bproj,
                        sa_q.value, sa_p.value, nh)
                elif train_bwd:
                    y = fused_attn_block_train(
                        xs, gs, gb, kqkv.reshape(C, 3 * C), bqkv,
                        kproj.reshape(C, C), bproj, nh)
                else:
                    y = fused_attn_block(xs, gs, gb, kqkv.reshape(C, 3 * C),
                                         bqkv, kproj.reshape(C, C), bproj,
                                         nh)
                return y.reshape(B, H, W, C)
            # calibration pass falls through to the full-precision path
            # below, recording the activation ranges (QConv pattern)
        h = GroupNormADM(dtype=self.dtype, name="norm")(x)
        if calibrating:
            from dxmi_tpu.ops.quant import calib_channel_scale

            # Intended equivalence note (ADVICE r4): this records
            # attn_act_scale from GroupNormADM under the ACTIVE
            # DXMI_GN_STATS mode, while _kernel_i8 recomputes GN with
            # its own fp32 one-pass mask-matmul stats.  The two
            # formulations agree to bf16-class rounding (the
            # bf16_onepass exactness tests), so the calibrated scales
            # transfer; the trained-fixture drift gates (PERF.md r4)
            # cover the composition.
            sa_q.value = jnp.maximum(
                sa_q.value, calib_channel_scale(h.reshape(-1, C)))
        qkv = nn.Conv(3 * C, (1, 1), dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(B, S, 3, nh, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        scale = 1.0 / math.sqrt(math.sqrt(d))
        if (self.attn_impl in ("flash", "fused", "fused_train")
                and flash_available(S, d)):
            a = flash_mha(q, k, v, sm_scale=scale * scale)
            a = a.astype(self.dtype).reshape(B, H, W, C)
        else:
            acc_t = jnp.float32 if self.softmax_f32 else self.dtype
            logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale,
                                preferred_element_type=acc_t)
            lg = logits.astype(acc_t)
            if os.environ.get("DXMI_FUSED_NOMAX") == "1":
                # exact-math max-pass removal (see ops/attn_block.
                # _softmax_rows); reaches the einsum fallbacks the fused
                # kernel's VMEM gate excludes (LSUN's C=1024 maps).
                # Same overflow/underflow clip as the kernel (ADVICE r4).
                e = jnp.exp(jnp.clip(lg, -80.0, 80.0))
                w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(self.dtype)
            else:
                w = jax.nn.softmax(lg, axis=-1).astype(self.dtype)
            a = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, H, W, C)
        if calibrating:
            from dxmi_tpu.ops.quant import calib_channel_scale

            sa_p.value = jnp.maximum(
                sa_p.value, calib_channel_scale(a.reshape(-1, C)))
        a = nn.Conv(C, (1, 1), dtype=self.dtype, kernel_init=zeros_init,
                    name="proj_out")(a)
        return x + a


class UNetADM(nn.Module):
    """The full ADM U-Net. ``__call__(x_nhwc, t[, y])``.

    Constructor mirrors the reference (cm/unet.py:556-603); channel_mult
    defaults resolve per image_size as in cm/script_util.py:122-134.
    """

    image_size: int
    in_channels: int = 3
    model_channels: int = 192
    out_channels: int = 3
    num_res_blocks: int = 3
    attention_resolutions: Tuple[int, ...] = (2, 4, 8)  # downsample RATES
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = ()
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32
    softmax_f32: bool = True
    attn_impl: str = "einsum"  # see AttentionBlockADM
    # int8 W8A8 ResBlock convs: False | True (dynamic) | 'static'
    quant_int8: object = False
    # 'static': ALSO run the fused attention blocks' qkv/proj matmuls
    # W8A8 inside the Pallas kernel (AttentionBlockADM.quant); requires
    # attn_impl='fused' + quant_int8='static' calibration
    quant_attn: object = False
    # decoder upsample implementation: see ResBlockADM.up_impl
    up_impl: str = "resize"

    def _channel_mult(self) -> Tuple[int, ...]:
        if self.channel_mult:
            return tuple(self.channel_mult)
        return {512: (1, 1, 2, 2, 4, 4), 256: (1, 1, 2, 2, 4, 4),
                128: (1, 1, 2, 3, 4), 64: (1, 2, 3, 4),
                32: (1, 2, 2, 2)}[self.image_size]

    def _heads(self, ch: int, upsample: bool) -> int:
        if self.num_head_channels != -1:
            return ch // self.num_head_channels
        if upsample and self.num_heads_upsample != -1:
            return self.num_heads_upsample
        return self.num_heads

    @nn.compact
    def __call__(self, x, t, y=None, *, deterministic: bool = True):
        ch_mult = self._channel_mult()
        mc = self.model_channels
        ted = mc * 4

        emb = adm_timestep_embedding(t, mc)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_0")(emb.astype(self.dtype))
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_2")(jax.nn.silu(emb))
        if self.num_classes is not None:
            assert y is not None, "class-conditional model needs y"
            emb = emb + nn.Embed(self.num_classes, ted, dtype=self.dtype,
                                 name="label_emb")(y)

        import functools

        rb_cls = ResBlockADM
        if self.use_checkpoint:
            rb_cls = nn.remat(ResBlockADM, static_argnums=())
        res_block = functools.partial(rb_cls, quant=self.quant_int8,
                                      up_impl=self.up_impl)

        x = x.astype(self.dtype)
        ch = int(ch_mult[0] * mc)
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                    name="input_blocks_0_0")(x)
        hs = [h]
        i_block = 1
        ds = 1
        for level, mult in enumerate(ch_mult):
            for _ in range(self.num_res_blocks):
                ch = int(mult * mc)
                h = res_block(ch, self.dropout, self.use_scale_shift_norm,
                              dtype=self.dtype,
                              name=f"input_blocks_{i_block}_0")(
                    h, emb, deterministic=deterministic)
                if ds in self.attention_resolutions:
                    h = AttentionBlockADM(self._heads(ch, False), dtype=self.dtype,
                                          softmax_f32=self.softmax_f32,
                                          attn_impl=self.attn_impl,
                                          quant=self.quant_attn,
                                          name=f"input_blocks_{i_block}_1")(h)
                hs.append(h)
                i_block += 1
            if level != len(ch_mult) - 1:
                if self.resblock_updown:
                    h = res_block(ch, self.dropout, self.use_scale_shift_norm,
                                  down=True, dtype=self.dtype,
                                  name=f"input_blocks_{i_block}_0")(
                        h, emb, deterministic=deterministic)
                else:
                    if self.conv_resample:
                        h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                                    dtype=self.dtype,
                                    name=f"input_blocks_{i_block}_0_op")(h)
                    else:
                        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
                hs.append(h)
                i_block += 1
                ds *= 2

        h = res_block(ch, self.dropout, self.use_scale_shift_norm,
                      dtype=self.dtype, name="middle_block_0")(
            h, emb, deterministic=deterministic)
        h = AttentionBlockADM(self._heads(ch, False), dtype=self.dtype,
                              softmax_f32=self.softmax_f32,
                              attn_impl=self.attn_impl,
                              quant=self.quant_attn,
                              name="middle_block_1")(h)
        h = res_block(ch, self.dropout, self.use_scale_shift_norm,
                      dtype=self.dtype, name="middle_block_2")(
            h, emb, deterministic=deterministic)

        i_block = 0
        for level, mult in reversed(list(enumerate(ch_mult))):
            for i in range(self.num_res_blocks + 1):
                ch = int(mult * mc)
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res_block(ch, self.dropout, self.use_scale_shift_norm,
                              dtype=self.dtype,
                              name=f"output_blocks_{i_block}_0")(
                    h, emb, deterministic=deterministic)
                j = 1
                if ds in self.attention_resolutions:
                    h = AttentionBlockADM(self._heads(ch, True), dtype=self.dtype,
                                          softmax_f32=self.softmax_f32,
                                          attn_impl=self.attn_impl,
                                          quant=self.quant_attn,
                                          name=f"output_blocks_{i_block}_{j}")(h)
                    j += 1
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res_block(ch, self.dropout, self.use_scale_shift_norm,
                                      up=True, dtype=self.dtype,
                                      name=f"output_blocks_{i_block}_{j}")(
                            h, emb, deterministic=deterministic)
                    elif self.conv_resample and self.up_impl == "phase":
                        from dxmi_tpu.models.unet_small import _ConvHolder
                        from dxmi_tpu.ops.phase_up import conv3x3_nearest_up2

                        k, b = _ConvHolder(
                            ch, (3, 3),
                            name=f"output_blocks_{i_block}_{j}_conv")(
                                h.shape[-1])
                        h = conv3x3_nearest_up2(h, k, b, self.dtype)
                    else:
                        h = _upsample2x(h)
                        if self.conv_resample:
                            h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                                        name=f"output_blocks_{i_block}_{j}_conv")(h)
                    ds //= 2
                i_block += 1
        assert not hs

        h = GroupNormADM(dtype=self.dtype, name="out_0")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=zeros_init, name="out_2")(h)
        return h.astype(jnp.float32)


def create_unet_adm(image_size: int, num_channels: int, num_res_blocks: int,
                    channel_mult: str = "", class_cond: bool = False,
                    num_classes: int = 1000,
                    use_checkpoint: bool = False,
                    attention_resolutions: str = "16",
                    num_heads: int = 1, num_head_channels: int = -1,
                    num_heads_upsample: int = -1,
                    use_scale_shift_norm: bool = False, dropout: float = 0.0,
                    resblock_updown: bool = False, use_fp16: bool = False,
                    use_new_attention_order: bool = False,
                    learn_sigma: bool = False,
                    dtype=None, softmax_f32=None,
                    quant_int8=False, attn_impl=None,
                    up_impl=None, quant_attn=None) -> UNetADM:
    """Factory mirroring cm/script_util.create_model:102-160, including the
    "32,16,8" attention-resolution string -> downsample-rate conversion.
    ``use_fp16`` selects bf16 compute on TPU — including bf16 attention
    softmax, matching the reference's half-precision attention in that
    mode (QKVAttentionLegacy casts qkv to half, cm/unet.py:423; measured
    +47% on ImageNet64 sampling, PERF.md). ``softmax_f32`` overrides."""
    if channel_mult:
        cm = tuple(int(c) for c in str(channel_mult).split(","))
    else:
        cm = ()
    attn_ds = tuple(image_size // int(r)
                    for r in str(attention_resolutions).split(","))
    if dtype is None:
        dtype = jnp.bfloat16 if use_fp16 else jnp.float32
    if softmax_f32 is None:
        softmax_f32 = not use_fp16
    if attn_impl is None:
        # Default: the Pallas flash kernel handles the big maps whenever
        # the net runs in bf16 (measured: +5% ImageNet64 sampling, -8%
        # train step, PERF.md; numerically CLOSER to the reference's
        # fp32 softmax than the bf16 einsum path). flash_available still
        # gates per-shape; einsum everywhere off-TPU. DXMI_FLASH_ATTN=0/1
        # forces either way.
        # DXMI_FUSED_ATTN=1 opts the big maps into the whole-block fused
        # kernel (ops/attn_block.py), degrading to flash/einsum per shape;
        # DXMI_FUSED_ATTN=train additionally uses the kernel's REAL
        # pallas backward (training path).
        if os.environ.get("DXMI_FUSED_ATTN") == "1":
            attn_impl = "fused"
        elif os.environ.get("DXMI_FUSED_ATTN") == "train":
            attn_impl = "fused_train"
        else:
            env = os.environ.get("DXMI_FLASH_ATTN")
            if env is not None:
                attn_impl = "flash" if env == "1" else "einsum"
            else:
                attn_impl = "flash" if use_fp16 else "einsum"
    if up_impl is None:
        # DXMI_UP_IMPL=phase opts decoder upsamples into the phase
        # decomposition (ops/phase_up.py); default keeps reference
        # op-order semantics.
        up_impl = os.environ.get("DXMI_UP_IMPL", "resize")
    if quant_attn is None:
        # W8A8 qkv/proj epilogues inside the fused attention kernel:
        # DEFAULT-ON whenever the static-int8 fused path is selected —
        # measured +3.0% ImageNet64 sampling with NO incremental drift
        # over the int8 path itself on the trained ADM fixture (Frechet
        # 0.0068 vs int8's 0.0079, pixel 1.26% vs 1.25% — PERF.md round
        # 4 gate table).  DXMI_QUANT_ATTN=0 opts out; any other value
        # (incl. =1) keeps the default-on behavior — the env var never
        # forces the combination where quant_int8/attn_impl don't
        # already select it (ADVICE r4).
        env = os.environ.get("DXMI_QUANT_ATTN")
        on = (env != "0") if env is not None else True
        quant_attn = ("static"
                      if on and quant_int8 == "static"
                      and attn_impl == "fused"
                      else False)
    return UNetADM(
        image_size=image_size,
        in_channels=3,
        model_channels=num_channels,
        out_channels=(6 if learn_sigma else 3),
        num_res_blocks=num_res_blocks,
        attention_resolutions=attn_ds,
        dropout=dropout,
        channel_mult=cm,
        num_classes=(num_classes if class_cond else None),
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown,
        use_checkpoint=use_checkpoint,
        dtype=dtype,
        softmax_f32=softmax_f32,
        attn_impl=attn_impl,
        quant_int8=quant_int8,
        quant_attn=quant_attn,
        up_impl=up_impl,
    )


def create_model_and_diffusion(**kwargs):
    """Factory parity with cm/script_util.create_model_and_diffusion
    (script_util.py:54-101): returns (UNetADM, KarrasDenoiser)."""
    from dxmi_tpu.samplers.edm import KarrasDenoiser

    sigma_min = kwargs.pop("sigma_min", 0.002)
    sigma_max = kwargs.pop("sigma_max", 80.0)
    weight_schedule = kwargs.pop("weight_schedule", "karras")
    distillation = kwargs.pop("distillation", False)
    sigma_data = kwargs.pop("sigma_data", 0.5)
    model = create_unet_adm(**kwargs)
    diffusion = KarrasDenoiser(
        sigma_data=sigma_data, sigma_max=sigma_max, sigma_min=sigma_min,
        weight_schedule=weight_schedule, distillation=distillation)
    return model, diffusion
