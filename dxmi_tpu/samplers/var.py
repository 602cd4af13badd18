"""VAR (user-defined variance) DDPM ancestral sampler — the DxMI policy for
CIFAR-10 (capability parity with /root/reference/models/DxMI/var_sampler.py).

TPU-native design:
  * the full T-step denoising loop is ONE ``lax.scan`` over stacked
    per-step constants (the reference runs a Python loop of T forwards),
  * per-step noise std sigma_t is a trainable parameter ``log_betas`` held
    in the *sampler's* param tree (the reference monkey-patches it onto the
    torch net, var_sampler.py:354-355),
  * all randomness is explicit: every step folds a fresh PRNG key.

Parameter tree layout::

    {"net": <flax net params>, "log_betas": (T,) float32}

``trainable_beta``:
  * True        — all T sigmas learned,
  * "fix_last"  — last step pinned to 1e-3 (no gradient),
  * False       — analytic schedule sigmas (last pinned to 1e-3).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from dxmi_tpu.schedules import VarSchedule, var_schedule

LOG_2PI = math.log(2.0 * math.pi)


def gaussian_logp_mean(x: jnp.ndarray, mean: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Per-sample Normal log-density, averaged over non-batch dims.

    ``x`` is treated as data (stop-gradient); gradients flow through
    ``mean`` and ``sigma`` — matching the reference's
    ``dist.log_prob(x.detach())`` (var_sampler.py:401-402).
    """
    x = jax.lax.stop_gradient(x)
    sigma = jnp.broadcast_to(sigma, x.shape) if sigma.ndim < x.ndim else sigma
    z = (x - mean) / sigma
    logp = -0.5 * z * z - jnp.log(sigma) - 0.5 * LOG_2PI
    return logp.reshape(x.shape[0], -1).mean(axis=1)


class VARSampler:
    """T-step DDPM policy with trainable per-step variance."""

    def __init__(self, net, n_timesteps: int, sample_shape: Tuple[int, int, int],
                 trainable_beta: Union[bool, str] = True,
                 adhoc_scale1: float = 1.0, adhoc_scale2: float = 1.0,
                 schedule: str = "quadratic"):
        assert trainable_beta in {True, False, "fix_last"}
        self.net = net
        self.n_timesteps = int(n_timesteps)
        # image sample_shape comes in reference (C, H, W) order from the
        # YAMLs -> NHWC internally; non-image shapes (e.g. (2,) for the 2D
        # experiment) pass through unchanged.
        if len(sample_shape) == 3:
            c, h, w = sample_shape
            self.sample_shape = (h, w, c)
        else:
            self.sample_shape = tuple(sample_shape)
        self.trainable_beta = trainable_beta
        self.schedule: VarSchedule = var_schedule(
            self.n_timesteps, schedule,
            adhoc_scale1=adhoc_scale1, adhoc_scale2=adhoc_scale2)
        self.adhoc_scale1 = adhoc_scale1
        self.adhoc_scale2 = adhoc_scale2

    # -- parameters --------------------------------------------------------

    @property
    def user_defined_eta(self):
        """q(x_t|x_{t+1}) betas consumed by the trainer when
        use_sampler_beta=True (reference trainer.py:145-149)."""
        import numpy as np

        return np.asarray(self.schedule.eta)

    def init_params(self, key: jax.Array, net_params: Optional[Dict] = None) -> Dict[str, Any]:
        if net_params is None:
            x = jnp.zeros((1, *self.sample_shape), jnp.float32)
            t = jnp.zeros((1,), jnp.float32)
            # jit the init: eager init dispatches thousands of tiny ops
            # (pathological over a remote-TPU tunnel)
            net_params = jax.jit(self.net.init)(key, x, t)["params"]
        return {
            "net": net_params,
            "log_betas": jnp.log(self.schedule.init_sigma),
        }

    def sigmas_all(self, params: Dict[str, Any]) -> jnp.ndarray:
        """Effective per-step sigma vector (T,), respecting trainable_beta."""
        sch = self.schedule
        if self.trainable_beta is True:
            return jnp.exp(params["log_betas"])
        if self.trainable_beta == "fix_last":
            # last step pinned to the reference's unscaled std buffer value
            # 1e-3 (var_sampler.py:181,323-324 — note init_sigma may carry
            # adhoc_scale2, the pin does not)
            sig = jnp.exp(params["log_betas"])
            return sig.at[-1].set(1e-3)
        # analytic: sigma_q with the terminal floor
        return sch.sigma_q.at[-1].set(1e-3)

    # -- single step --------------------------------------------------------

    def sample_step(self, params: Dict[str, Any], x: jnp.ndarray,
                    t: jnp.ndarray, key: jax.Array, y: Optional[jnp.ndarray] = None,
                    *, train: bool = False,
                    dropout_rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
        """One ancestral step at (possibly per-sample) timestep ``t``.

        Returns the reference d_step contract (var_sampler.py:405-408):
        sample, mean (B,H,W,C); sigma, logp, logp_terminal, entropy (B,);
        control (B,H,W,C).
        """
        del y  # unconditional policy
        sch = self.schedule
        B = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t), (B,))

        tau = jnp.take(sch.tau, t)
        eps = self._net_apply(params, x, tau, train=train, dropout_rng=dropout_rng)

        bshape = (-1,) + (1,) * (x.ndim - 1)
        x_mult = jnp.take(sch.x_mult, t).reshape(bshape)
        eps_mult = jnp.take(sch.eps_mult, t).reshape(bshape)
        control = eps_mult * eps
        mean = x * x_mult + control

        sigma = jnp.take(self.sigmas_all(params), t)
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        sample = mean + sigma.reshape(bshape) * noise

        logp = gaussian_logp_mean(sample, mean, sigma.reshape(bshape))
        entropy = jnp.log(sigma)
        return {
            "sample": sample,
            "mean": mean,
            "sigma": sigma,
            "logp": logp,
            "logp_terminal": jnp.zeros((B,), x.dtype),
            "entropy": entropy,
            "control": control,
        }

    def _net_apply(self, params, x, tau, *, train: bool, dropout_rng):
        kwargs = dict(deterministic=not train)
        rngs = {"dropout": dropout_rng} if (train and dropout_rng is not None) else None
        variables = {"params": params["net"]}
        if "quant_scales" in params:  # static-int8 sampling mode
            variables["quant_scales"] = params["quant_scales"]
        return self.net.apply(variables, x, tau, rngs=rngs, **kwargs)

    # -- full trajectory -----------------------------------------------------

    def sample(self, params: Dict[str, Any], key: jax.Array, n_sample: int,
               *, train: bool = False,
               dropout_rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
        """Full T-step trajectory as one ``lax.scan``.

        d_sample contract (stacked-array version of var_sampler.py:411-428):
          sample (B,H,W,C); l_sample (T+1,B,H,W,C); logp (T,B);
          logp_terminal (B,); mean/control (T,B,H,W,C); sigma/entropy (T,B).
        """
        key, init_key = jax.random.split(key)
        x0 = jax.random.normal(init_key, (n_sample, *self.sample_shape), jnp.float32)

        sigmas = self.sigmas_all(params)
        step_keys = jax.random.split(key, self.n_timesteps)
        if dropout_rng is not None:
            drop_keys = jax.random.split(dropout_rng, self.n_timesteps)
        else:
            drop_keys = jnp.zeros((self.n_timesteps, 2), jnp.uint32)

        sch = self.schedule

        def step(x, inputs):
            i, k, dk = inputs
            tau = jnp.full((n_sample,), sch.tau[i])
            eps = self._net_apply(
                params, x, tau, train=train,
                dropout_rng=(dk if dropout_rng is not None else None))
            control = sch.eps_mult[i] * eps
            mean = x * sch.x_mult[i] + control
            sigma = sigmas[i]
            noise = jax.random.normal(k, x.shape, dtype=x.dtype)
            x_next = mean + sigma * noise
            logp = gaussian_logp_mean(x_next, mean, jnp.broadcast_to(sigma, x.shape))
            out = {
                "x": x_next,
                "logp": logp,
                "control": control,
                "mean": mean,
                "sigma": jnp.full((n_sample,), sigma),
                "entropy": jnp.full((n_sample,), jnp.log(sigma)),
            }
            return x_next, out

        idx = jnp.arange(self.n_timesteps)
        import os
        unroll = int(os.environ.get("DXMI_SCAN_UNROLL", "1"))
        _, traj = jax.lax.scan(step, x0, (idx, step_keys, drop_keys),
                               unroll=unroll)

        l_sample = jnp.concatenate([x0[None], traj["x"]], axis=0)
        return {
            "sample": traj["x"][-1],
            "l_sample": l_sample,
            "logp": traj["logp"],
            "logp_terminal": jnp.zeros((n_sample,), jnp.float32),
            "mean": traj["mean"],
            "sigma": traj["sigma"],
            "entropy": traj["entropy"],
            "control": traj["control"],
        }

    # -- int8 static-scale calibration -----------------------------------

    def calibrate_quant(self, params: Dict[str, Any], key: jax.Array,
                        n_sample: int = 64, n_rounds: int = 2) -> Dict[str, Any]:
        """Calibrate static activation ranges for a ``quant_int8='static'``
        net: run full-precision trajectories with the 'quant_scales'
        collection mutable (each QConv records its running max |x|).
        Returns params with the calibrated 'quant_scales' attached
        (inference-only; strip before training)."""
        x0 = jnp.zeros((1, *self.sample_shape), jnp.float32)
        scales = self.net.init(jax.random.fold_in(key, 999), x0,
                               jnp.zeros((1,), jnp.float32))["quant_scales"]
        sch = self.schedule
        sigmas = self.sigmas_all(params)

        @jax.jit
        def calib_step(scales, x, tau):
            eps, updated = self.net.apply(
                {"params": params["net"], "quant_scales": scales},
                x, tau, mutable=["quant_scales"])
            return eps, updated["quant_scales"]

        for r in range(n_rounds):
            key, k0 = jax.random.split(key)
            x = jax.random.normal(k0, (n_sample, *self.sample_shape))
            for i in range(self.n_timesteps):
                key, kn = jax.random.split(key)
                tau = jnp.full((n_sample,), sch.tau[i])
                eps, scales = calib_step(scales, x, tau)
                mean = x * sch.x_mult[i] + sch.eps_mult[i] * eps
                x = mean + sigmas[i] * jax.random.normal(kn, x.shape)
        return dict(params, quant_scales=scales)

    # -- diagnostics ----------------------------------------------------------

    def log_prob_step(self, params: Dict[str, Any], x_prev: jnp.ndarray,
                      x_next: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """log p(x_next | x_prev, t) under the current policy, using the
        analytic schedule std (reference var_sampler.py:431-444)."""
        sch = self.schedule
        B = x_prev.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t), (B,))
        tau = jnp.take(sch.tau, t)
        eps = self._net_apply({"net": params["net"]}, x_prev, tau,
                              train=False, dropout_rng=None)
        bshape = (-1,) + (1,) * (x_prev.ndim - 1)
        mean = x_prev * jnp.take(sch.x_mult, t).reshape(bshape) \
            + jnp.take(sch.eps_mult, t).reshape(bshape) * eps
        std = jnp.take(sch.init_sigma, t).reshape(bshape)
        return gaussian_logp_mean(x_next, mean, std)
