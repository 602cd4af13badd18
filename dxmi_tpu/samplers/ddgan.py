"""DDGAN 4-step posterior sampler (the DxMI policy for CIFAR-10 T=4).

The reference targets ``models.ddgan.DDGANSampler`` which is NOT in the
snapshot (SURVEY.md §2.0); rebuilt from the config contract
(configs/cifar10/T4_ddgan.yaml: n_timesteps=4, trainable_beta='fix_last',
use_z=True) and the published DDGAN semantics (Xiao et al., ICLR 2022):

  * denoising generator x0_hat = G(x_t, t, z), z ~ N(0, I_nz) per step,
  * one step samples the DDPM posterior
        q(x_{t-1} | x_t, x0_hat) = N(c1_t x0_hat + c2_t x_t, beta_tilde_t),
  * the VP-SDE discretised beta schedule over T steps
    (beta_min=0.1, beta_max=20, eps_small=1e-3).

DxMI then treats sqrt(beta_tilde) as the trainable per-step sigma
(``log_betas``), exactly as with the other policies. Exposes the same
``sample_step``/``sample`` d_step/d_sample contract; the full loop is one
``lax.scan``.

Parameter tree: {"net": <NCSNpp params>, "log_betas": (T,)}.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.samplers.var import gaussian_logp_mean


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDGANSchedule:
    """Per-step posterior coefficients, indexed by SAMPLING step i
    (i=0 consumes the noisiest state; i=T-1 emits x_0)."""

    x0_coef: jnp.ndarray     # (T,) coefficient of the x0 prediction
    xt_coef: jnp.ndarray     # (T,) coefficient of the current state
    sigma_q: jnp.ndarray     # (T,) analytic posterior std (last ~ 0)
    init_sigma: jnp.ndarray  # (T,) log_betas init (last clamped to 1e-3)
    eta: jnp.ndarray         # (T,) per-step beta (for betas_for_q)


def _vp_variance(t: np.ndarray, beta_min=0.1, beta_max=20.0) -> np.ndarray:
    log_mean_coeff = -0.25 * t**2 * (beta_max - beta_min) - 0.5 * t * beta_min
    return 1.0 - np.exp(2.0 * log_mean_coeff)


def ddgan_schedule(n_timesteps: int, beta_min=0.1, beta_max=20.0,
                   eps_small=1e-3) -> DDGANSchedule:
    T = n_timesteps
    t = np.arange(0, T + 1, dtype=np.float64) / T
    t = t * (1.0 - eps_small) + eps_small
    var = _vp_variance(t, beta_min, beta_max)
    alpha_bar = 1.0 - var
    betas = 1.0 - alpha_bar[1:] / alpha_bar[:-1]           # (T,) DDGAN betas
    alphas = 1.0 - betas
    a_bar = np.cumprod(alphas)
    a_bar_prev = np.concatenate([[1.0], a_bar[:-1]])

    # posterior q(x_{t-1} | x_t, x0) coefficients in DDGAN time (t=1..T)
    c1 = betas * np.sqrt(a_bar_prev) / (1.0 - a_bar)        # x0 coef
    c2 = (1.0 - a_bar_prev) * np.sqrt(alphas) / (1.0 - a_bar)
    post_var = betas * (1.0 - a_bar_prev) / (1.0 - a_bar)
    post_std = np.sqrt(np.maximum(post_var, 0.0))
    post_std[0] = 0.0  # the t=1 -> x0 step is deterministic in DDGAN

    # sampling order: step i uses DDGAN time t = T - i
    order = np.arange(T)[::-1]
    init = post_std[order].copy()
    init[-1] = 1e-3  # floor for the trainable terminal sigma
    f32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
    return DDGANSchedule(
        x0_coef=f32(c1[order]),
        xt_coef=f32(c2[order]),
        sigma_q=f32(post_std[order]),
        init_sigma=f32(init),
        eta=f32(betas[order]),
    )


class DDGANSampler:
    """T-step DDGAN posterior policy with trainable per-step sigma."""

    def __init__(self, net, n_timesteps: int, sample_shape: Tuple[int, int, int],
                 trainable_beta: Union[bool, str] = "fix_last",
                 use_z: bool = True, nz: int = 100,
                 beta_min: float = 0.1, beta_max: float = 20.0):
        assert trainable_beta in {True, False, "fix_last"}
        self.net = net
        self.n_timesteps = int(n_timesteps)
        c, h, w = sample_shape
        self.sample_shape = (h, w, c)
        self.trainable_beta = trainable_beta
        self.use_z = bool(use_z)
        self.nz = int(getattr(getattr(net, "config", None), "nz", nz))
        self.schedule = ddgan_schedule(self.n_timesteps, beta_min, beta_max)

    @property
    def user_defined_eta(self):
        """q-process betas for the trainer's running cost."""
        return np.asarray(self.schedule.eta)

    def init_params(self, key: jax.Array, net_params=None) -> Dict[str, Any]:
        if net_params is None:
            x = jnp.zeros((1, *self.sample_shape), jnp.float32)
            t = jnp.zeros((1,), jnp.float32)
            z = jnp.zeros((1, self.nz), jnp.float32)
            net_params = jax.jit(self.net.init)(key, x, t, z)["params"]
        return {"net": net_params,
                "log_betas": jnp.log(self.schedule.init_sigma)}

    def sigmas_all(self, params) -> jnp.ndarray:
        sch = self.schedule
        if self.trainable_beta is True:
            return jnp.exp(params["log_betas"])
        if self.trainable_beta == "fix_last":
            return jnp.exp(params["log_betas"]).at[-1].set(1e-3)
        return jnp.clip(sch.sigma_q, 1e-3)

    def _ddgan_t(self, i):
        """DDGAN conditions the generator on its own time index; step i of
        sampling corresponds to t = T-1-i (noisiest first)."""
        return self.n_timesteps - 1 - i

    def sample_step(self, params, x, t, key, y=None, *, train=False,
                    dropout_rng=None) -> Dict[str, jnp.ndarray]:
        del y
        sch = self.schedule
        B = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t), (B,))
        k_z, k_n = jax.random.split(key)

        if self.use_z:
            z = jax.random.normal(k_z, (B, self.nz), x.dtype)
        else:
            z = jnp.zeros((B, self.nz), x.dtype)
        rngs = {"dropout": dropout_rng} if (train and dropout_rng is not None) else None
        variables = {"params": params["net"]}
        if "quant_scales" in params:  # static-int8 sampling mode
            variables["quant_scales"] = params["quant_scales"]
        x0_pred = self.net.apply(variables, x,
                                 self._ddgan_t(t).astype(jnp.float32), z,
                                 rngs=rngs, deterministic=not train)

        c1 = jnp.take(sch.x0_coef, t)[:, None, None, None]
        c2 = jnp.take(sch.xt_coef, t)[:, None, None, None]
        mean = c1 * x0_pred + c2 * x
        sigma = jnp.take(self.sigmas_all(params), t)
        noise = jax.random.normal(k_n, x.shape, x.dtype)
        sample = mean + sigma[:, None, None, None] * noise

        logp = gaussian_logp_mean(sample, mean, sigma[:, None, None, None])
        return {
            "sample": sample,
            "mean": mean,
            "sigma": sigma,
            "logp": logp,
            "logp_terminal": jnp.zeros((B,), x.dtype),
            "entropy": jnp.log(sigma),
            "control": (c1 * x0_pred).astype(x.dtype),
        }

    def calibrate_quant(self, params: Dict[str, Any], key: jax.Array,
                        n_sample: int = 64, n_rounds: int = 2) -> Dict[str, Any]:
        """Calibrate static activation ranges for a ``quant_int8='static'``
        NCSN++: run full-precision T-step trajectories with the
        'quant_scales' collection mutable (each QConv records its running
        range statistic). Returns params with 'quant_scales' attached
        (inference-only; strip before training). Same contract as
        VARSampler/EDMSampler.calibrate_quant."""
        x0 = jnp.zeros((1, *self.sample_shape), jnp.float32)
        z0 = jnp.zeros((1, self.nz), jnp.float32)
        scales = self.net.init(jax.random.fold_in(key, 999), x0,
                               jnp.zeros((1,), jnp.float32),
                               z0)["quant_scales"]
        sch = self.schedule
        sigmas = self.sigmas_all(params)

        @jax.jit
        def calib_step(scales, x, t, z):
            x0p, updated = self.net.apply(
                {"params": params["net"], "quant_scales": scales},
                x, t, z, mutable=["quant_scales"])
            return x0p, updated["quant_scales"]

        for _ in range(n_rounds):
            key, k0 = jax.random.split(key)
            x = jax.random.normal(k0, (n_sample, *self.sample_shape))
            for i in range(self.n_timesteps):
                key, kz, kn = jax.random.split(key, 3)
                t = jnp.full((n_sample,), i, jnp.int32)
                z = (jax.random.normal(kz, (n_sample, self.nz))
                     if self.use_z else jnp.zeros((n_sample, self.nz)))
                x0p, scales = calib_step(
                    scales, x, self._ddgan_t(t).astype(jnp.float32), z)
                c1 = jnp.take(sch.x0_coef, t)[:, None, None, None]
                c2 = jnp.take(sch.xt_coef, t)[:, None, None, None]
                mean = c1 * x0p + c2 * x
                x = mean + jnp.take(sigmas, t)[:, None, None, None] \
                    * jax.random.normal(kn, x.shape)
        return dict(params, quant_scales=scales)

    def sample(self, params, key, n_sample: int, *, train=False,
               dropout_rng=None) -> Dict[str, jnp.ndarray]:
        key, k0 = jax.random.split(key)
        x0 = jax.random.normal(k0, (n_sample, *self.sample_shape), jnp.float32)

        step_keys = jax.random.split(key, self.n_timesteps)
        if dropout_rng is not None:
            drop_keys = jax.random.split(dropout_rng, self.n_timesteps)
        else:
            drop_keys = jnp.zeros((self.n_timesteps, 2), jnp.uint32)

        def step(x, inputs):
            i, k, dk = inputs
            t = jnp.full((n_sample,), i, dtype=jnp.int32)
            d = self.sample_step(params, x, t, k, train=train,
                                 dropout_rng=(dk if dropout_rng is not None else None))
            out = {"x": d["sample"], "logp": d["logp"], "mean": d["mean"],
                   "sigma": d["sigma"], "entropy": d["entropy"],
                   "control": d["control"]}
            return d["sample"], out

        idx = jnp.arange(self.n_timesteps)
        x_final, traj = jax.lax.scan(step, x0, (idx, step_keys, drop_keys))
        return {
            "sample": x_final,
            "l_sample": jnp.concatenate([x0[None], traj["x"]], axis=0),
            "logp": traj["logp"],
            "logp_terminal": jnp.zeros((n_sample,), jnp.float32),
            "mean": traj["mean"],
            "sigma": traj["sigma"],
            "entropy": traj["entropy"],
            "control": traj["control"],
        }
