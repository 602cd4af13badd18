"""Flash attention for the ADM nets' self-attention maps.

The reference computes attention as two explicit matmuls with the full
S x S logit tensor materialized (cm/unet.py:263-378, QKVAttentionLegacy).
On TPU, XLA executes the same shape at ~3% MFU for the hot ImageNet64
map (S=1024, d=64, 6 heads): the logits round-trip HBM and the d=64
contraction under-fills the MXU.  The Pallas flash-attention kernel
(jax.experimental.pallas.ops.tpu.flash_attention) keeps the whole K/V
block in VMEM — at these map sizes K/V PER HEAD is only S*d*2 bytes
(128 KB at S=1024), so we run it with ONE kv block (block_k = S) which
selects the kernel's single-block fast path (no online-softmax rescaling
loop) and a whole-map q block.

Measured on v5e (scripts/bench_flash_blocks.py, serialized-dispatch
chain): S=1024 nh=6 d=64 B=8: 1.96 ms vs 3.13 ms XLA (-37%); B=16:
4.21 vs 4.46 ms; S=256 is a wash. ``flash_attention_auto`` therefore
engages only for S >= 512 and falls back to the caller's einsum path
elsewhere (the caller handles the fallback; this module just answers
"can/should the kernel run").

Numerics: the kernel computes the softmax in fp32 regardless of input
dtype (rel. diff vs bf16-softmax einsum ~0.3%, i.e. bf16 noise), so it
is closest to the reference's fp32-softmax path while costing less than
the bf16 one.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def flash_available(seq_len: int, head_dim: int) -> bool:
    """True if the Pallas kernel supports + should handle this shape.

    Constraints: TPU backend, S a multiple of the kernel's 128-lane
    MIN_BLOCK_SIZE, head_dim <= the 128-lane register tile, and S large
    enough (>= 512) that the kernel beats XLA (measured crossover).
    """
    return (_tpu_backend() and seq_len >= 512 and seq_len % 128 == 0
            and head_dim <= 128)


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def _flash_bnsd(q, k, v, sm_scale: float):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    B, nh, S, d = q.shape
    # One kv block (block_k = S) -> single-block fast path; whole-map q
    # block; block_b=2 measured best at B=8 (must divide B). A
    # B-dependent refinement from the standalone sweep (bq=512/bb=1 at
    # B>=16) measured NO in-model difference — kept simple.
    bq = min(S, 1024)
    bb = 2 if B % 2 == 0 else 1
    bs = BlockSizes(
        block_q=bq, block_k_major=S, block_k=S, block_b=bb,
        block_q_major_dkv=bq, block_k_major_dkv=S, block_k_dkv=S,
        block_q_dkv=bq,
        block_k_major_dq=S, block_k_dq=S, block_q_dq=bq,
    )
    return flash_attention(q, k, v, sm_scale=sm_scale, block_sizes=bs)


def flash_mha(q, k, v, sm_scale: float):
    """Multi-head attention via the Pallas TPU flash kernel.

    q, k, v: (B, S, nh, d) — the ADM nets' native layout.  Returns
    (B, S, nh, d).  Softmax accumulates in fp32 inside the kernel.
    Differentiable (the kernel ships its own fused backward).
    """
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = _flash_bnsd(qt, kt, vt, sm_scale)
    return jnp.swapaxes(out, 1, 2)
