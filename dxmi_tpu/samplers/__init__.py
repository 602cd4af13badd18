"""Sampler (policy) wrappers.

Each sampler is a thin static container (network module + frozen schedule +
flags) exposing pure functions:

  * ``sample_step(params, x, t, key, ...) -> d_step`` — one stochastic
    denoising step, differentiable wrt params (the policy-gradient path),
  * ``sample(params, key, n) -> d_sample``    — the full T-step trajectory
    as a single ``lax.scan``.

The d_step/d_sample dict contracts mirror the reference
(/root/reference/models/DxMI/var_sampler.py:357-428), with trajectory
tensors stacked on a leading (T, ...) axis instead of Python lists.
"""
