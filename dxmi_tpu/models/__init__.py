"""Flax network zoo for dxmi_tpu.

All models are NHWC (TPU-native conv layout), take fp32 parameters and an
optional bf16 compute dtype, and expose ``apply(params, x, t[, y])``-style
pure callables through flax.linen.
"""
