"""DxMI trainers (the MaxEnt-IRL algorithm), expressed as jitted programs.

Reference semantics preserved (/root/reference/models/DxMI/trainer.py):
replay buffer of (state, next_state, t, ...) transitions; contrastive
energy update at the terminal step; per-timestep TD value regression with
one optimizer step per timestep; policy update by re-executing single
stochastic steps on buffered states.

TPU-native mechanics: the buffer is a regular (T, B, ...) pytree; the TD
sweep is a ``lax.scan`` carrying (params, opt_state); each update phase is
one compiled program; gradients reduce over the data-parallel mesh axis
via XLA collectives inserted by jit.
"""
