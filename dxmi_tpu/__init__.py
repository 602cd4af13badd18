"""dxmi_tpu — a TPU-native (JAX/Flax/Pallas/pjit) framework for
Maximum Entropy Inverse Reinforcement Learning of diffusion models (DxMI).

Re-implementation, from scratch, of the capabilities of
swyoon/Diffusion-by-MaxEntIRL (NeurIPS 2024): fine-tuning short-horizon
(T=4/10) diffusion samplers with a jointly-trained energy-based model /
value function, formulated as maximum-entropy IRL.

Design stance (TPU-first, not a port):
  * All per-step sampler math is pure functions scanned with ``lax.scan``.
  * The replay buffer is a regular ``(T, B, ...)`` pytree — no dynamic
    concatenation, no boolean masking.
  * Value TD sweeps carry (params, opt_state) through ``lax.scan`` so the
    whole critic update is ONE compiled program.
  * Data parallelism is SPMD over a ``jax.sharding.Mesh``; gradient
    reduction is an XLA ``psum`` over the ``data`` axis (no DDP).
  * bf16 compute / fp32 params; no loss-scaling machinery is needed.
"""

__version__ = "0.1.0"
