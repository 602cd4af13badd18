"""EDM Euler-ancestral policy — the DxMI sampler for ImageNet64 / LSUN.

Capability parity with /root/reference/models/DxMI/openai_diffusion.py
(``OpenAIDiffusion`` wrapping a cm ``UNetModel`` + ``KarrasDenoiser``):
Karras rho-spaced sigma grid, ancestral sigma_down/sigma_up split,
trainable per-step noise ``log_betas`` initialised from
``log(clamp(sigma_up, 1e-3))``, ``fix_last``/``fix_last3`` masks restoring
the analytic terminal sigmas, and the 1e-4 sigma floor for log-prob safety.

TPU-native: the denoiser preconditioning (c_skip/c_out/c_in, rescaled_t)
is inlined into the step function; the T-step loop is one ``lax.scan``;
bf16 compute replaces the reference's fp16 master-param machinery.

Parameter tree: {"net": <UNetADM params>, "log_betas": (T,)}.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from dxmi_tpu.samplers.var import gaussian_logp_mean
from dxmi_tpu.schedules import (KarrasSchedule, edm_rescaled_t, edm_scalings,
                                karras_schedule)


class KarrasDenoiser:
    """EDM preconditioning wrapper (cm/karras_diffusion.py:34-351's live
    surface: get_scalings + denoise; distillation boundary optional)."""

    def __init__(self, sigma_data: float = 0.5, sigma_max: float = 80.0,
                 sigma_min: float = 0.002, rho: float = 7.0,
                 weight_schedule: str = "uniform", distillation: bool = False,
                 loss_norm: str = "l2"):
        self.sigma_data = sigma_data
        self.sigma_max = sigma_max
        self.sigma_min = sigma_min
        self.rho = rho
        self.weight_schedule = weight_schedule
        self.distillation = distillation
        # consumed by trainers.distill (karras_diffusion.py:44,206,311)
        self.loss_norm = loss_norm

    def scalings(self, sigma):
        if not self.distillation:
            return edm_scalings(sigma, self.sigma_data)
        # boundary-condition variant (consistency models)
        c_skip = self.sigma_data**2 / ((sigma - self.sigma_min) ** 2 + self.sigma_data**2)
        c_out = ((sigma - self.sigma_min) * self.sigma_data
                 / jnp.sqrt(sigma**2 + self.sigma_data**2))
        c_in = 1.0 / jnp.sqrt(sigma**2 + self.sigma_data**2)
        return c_skip, c_out, c_in

    def denoise(self, net, net_params, x, sigma, y=None, *, train=False,
                dropout_rng=None, extra_vars=None, mutable=False):
        """-> (model_output, denoised x0 estimate).

        ``extra_vars``: additional variable collections (e.g. calibrated
        'quant_scales' for int8 sampling). ``mutable``: list of
        collections to return updated (calibration passes) — then
        returns (out, denoised, updated_vars)."""
        dims = x.ndim
        c_skip, c_out, c_in = (s.reshape(-1, *([1] * (dims - 1)))
                               for s in self.scalings(sigma))
        rescaled_t = edm_rescaled_t(sigma)
        rngs = {"dropout": dropout_rng} if (train and dropout_rng is not None) else None
        variables = {"params": net_params}
        if extra_vars:
            variables.update(extra_vars)
        if mutable:
            out, upd = net.apply(variables, c_in * x, rescaled_t, y,
                                 rngs=rngs, deterministic=not train,
                                 mutable=mutable)
            return out, c_out * out + c_skip * x, upd
        out = net.apply(variables, c_in * x, rescaled_t, y,
                        rngs=rngs, deterministic=not train)
        return out, c_out * out + c_skip * x


class EDMSampler:
    """T-step Euler-ancestral policy over a Karras sigma grid."""

    def __init__(self, net, diffusion: Optional[KarrasDenoiser],
                 n_timesteps: int, sample_shape: Tuple[int, int, int],
                 class_cond: bool = False, num_classes: Optional[int] = 0,
                 trainable_beta: Union[bool, str] = False,
                 sigma_min: float = 0.002, sigma_max: float = 80.0,
                 stochastic_last: bool = False, rho: float = 7.0):
        assert trainable_beta in {True, False, "fix_last", "fix_last3"}
        self.net = net
        self.diffusion = diffusion or KarrasDenoiser(
            sigma_min=sigma_min, sigma_max=sigma_max, rho=rho)
        self.n_timesteps = int(n_timesteps)
        c, h, w = sample_shape
        self.sample_shape = (h, w, c)
        self.class_cond = bool(class_cond)
        self.num_classes = int(num_classes or 0)
        self.trainable_beta = trainable_beta
        self.sigma_max = float(sigma_max)
        self.schedule: KarrasSchedule = karras_schedule(
            self.n_timesteps, sigma_min, sigma_max, rho,
            stochastic_last=stochastic_last)

    @property
    def sigmas(self):
        return self.schedule.sigmas

    # q-process betas for the trainer (trainer.py:516-517 uses sigmas^2)
    @property
    def betas_for_q_default(self):
        return self.schedule.sigmas ** 2

    def init_params(self, key: jax.Array, net_params=None) -> Dict[str, Any]:
        if net_params is None:
            x = jnp.zeros((1, *self.sample_shape), jnp.float32)
            t = jnp.zeros((1,), jnp.float32)
            y = jnp.zeros((1,), jnp.int32) if self.class_cond else None
            net_params = jax.jit(self.net.init)(key, x, t, y)["params"]
        # log_betas init: log(clamp(sigma_up, 1e-3)) (openai_diffusion.py:43-48)
        log_betas = jnp.log(jnp.clip(self.schedule.sigma_up, 1e-3))
        return {"net": net_params, "log_betas": log_betas}

    def calibrate_quant(self, params: Dict[str, Any], key: jax.Array,
                        n_sample: int = 8, n_rounds: int = 2,
                        i_class=None) -> Dict[str, Any]:
        """Calibrate static activation ranges for a ``quant_int8='static'``
        ADM net: run full-precision trajectories with the 'quant_scales'
        collection mutable (each QConv records per-input-channel |x| max).
        Returns params with the calibrated 'quant_scales' attached
        (inference-only; strip before training)."""
        x0 = jnp.zeros((1, *self.sample_shape), jnp.float32)
        t0 = jnp.zeros((1,), jnp.float32)
        y0 = jnp.zeros((1,), jnp.int32) if self.class_cond else None
        scales = jax.jit(self.net.init)(
            jax.random.fold_in(key, 999), x0, t0, y0)["quant_scales"]
        sch = self.schedule
        sigmas_up = self.sigmas_up_all(params)

        @jax.jit
        def calib_step(net_params, scales, x, t, y, k):
            # net_params is an ARGUMENT, not a closure constant: baking
            # 300M+ params into the HLO overflows the remote-compile
            # request (PERF.md const-baking note)
            sigma = jnp.take(sch.sigmas, t)
            _, denoised, upd = self.diffusion.denoise(
                self.net, net_params, x, sigma, y=y,
                extra_vars={"quant_scales": scales},
                mutable=["quant_scales"])
            sb = sigma[:, None, None, None]
            d = (x - denoised) / sb
            dt = (jnp.take(sch.sigma_down, t) - sigma)[:, None, None, None]
            mu = x + d * dt
            noise = jax.random.normal(k, x.shape, dtype=x.dtype)
            nxt = mu + noise * jnp.take(sigmas_up, t)[:, None, None, None]
            return nxt, upd["quant_scales"]

        for r in range(n_rounds):
            key, k0, ky = jax.random.split(key, 3)
            x = jax.random.normal(
                k0, (n_sample, *self.sample_shape)) * self.sigma_max
            y = None
            if self.class_cond:
                y = (jax.random.randint(ky, (n_sample,), 0, self.num_classes)
                     if i_class is None
                     else jnp.full((n_sample,), i_class, jnp.int32))
            for i in range(self.n_timesteps):
                key, kn = jax.random.split(key)
                t = jnp.full((n_sample,), i, dtype=jnp.int32)
                x, scales = calib_step(params["net"], scales, x, t, y, kn)
        return dict(params, quant_scales=scales)

    def sigmas_up_all(self, params) -> jnp.ndarray:
        """Effective per-step injected-noise sigma (T,)."""
        sch = self.schedule
        if self.trainable_beta is False:
            return sch.sigma_up
        sig = jnp.exp(params["log_betas"])
        if self.trainable_beta == "fix_last":
            sig = sig.at[-1].set(sch.sigma_up[-1])
        elif self.trainable_beta == "fix_last3":
            n = self.n_timesteps
            keep = jnp.arange(n) < n - 3
            sig = jnp.where(keep, sig, sch.sigma_up)
        return sig

    # ------------------------------------------------------------------

    def sample_step(self, params, x, t, key, y=None, *, train=False,
                    dropout_rng=None) -> Dict[str, jnp.ndarray]:
        """One Euler-ancestral step (openai_diffusion.py:67-99): denoise,
        ODE-step to sigma_down, add sigma_up noise. d_step contract:
        sample/mean (B,H,W,C), sigma (B,) clamped >= 1e-4."""
        sch = self.schedule
        B = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t), (B,))
        sigma = jnp.take(sch.sigmas, t)
        extra = ({"quant_scales": params["quant_scales"]}
                 if "quant_scales" in params else None)  # static-int8 mode
        _, denoised = self.diffusion.denoise(
            self.net, params["net"], x, sigma, y=y, train=train,
            dropout_rng=dropout_rng, extra_vars=extra)

        sigma_b = sigma[:, None, None, None]
        d = (x - denoised) / sigma_b
        dt = (jnp.take(sch.sigma_down, t) - sigma)[:, None, None, None]
        mu = x + d * dt

        sigma_up = jnp.take(self.sigmas_up_all(params), t)
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        sample = mu + noise * sigma_up[:, None, None, None]
        sigma_out = jnp.clip(sigma_up, 1e-4)  # avoid -inf logs downstream

        logp = gaussian_logp_mean(sample, mu, sigma_out[:, None, None, None])
        return {
            "sample": sample,
            "mean": mu,
            "sigma": sigma_out,
            "logp": logp,
            "logp_terminal": jnp.zeros((B,), x.dtype),
            "entropy": jnp.log(sigma_out),
            "control": (d * dt).astype(x.dtype),
        }

    def sample(self, params, key, n_sample: int, i_class=None, x0=None,
               *, train=False, dropout_rng=None) -> Dict[str, jnp.ndarray]:
        """Full trajectory (openai_diffusion.py:101-127): x_T ~ N(0, I) *
        sigma_max; optional class conditioning (random y when None)."""
        key, k_init, k_y = jax.random.split(key, 3)
        y = None
        if self.class_cond:
            if i_class is None:
                y = jax.random.randint(k_y, (n_sample,), 0, self.num_classes)
            elif jnp.ndim(i_class) == 0:
                y = jnp.full((n_sample,), i_class, dtype=jnp.int32)
            else:
                y = jnp.asarray(i_class, dtype=jnp.int32)

        if x0 is None:
            x = jax.random.normal(k_init, (n_sample, *self.sample_shape),
                                  jnp.float32) * self.sigma_max
        else:
            x = x0

        step_keys = jax.random.split(key, self.n_timesteps)
        if dropout_rng is not None:
            drop_keys = jax.random.split(dropout_rng, self.n_timesteps)
        else:
            drop_keys = jnp.zeros((self.n_timesteps, 2), jnp.uint32)

        def step(carry, inputs):
            xc = carry
            i, k, dk = inputs
            t = jnp.full((n_sample,), i, dtype=jnp.int32)
            d = self.sample_step(params, xc, t, k, y=y, train=train,
                                 dropout_rng=(dk if dropout_rng is not None else None))
            out = {"x": d["sample"], "mean": d["mean"], "sigma": d["sigma"],
                   "logp": d["logp"], "entropy": d["entropy"]}
            return d["sample"], out

        idx = jnp.arange(self.n_timesteps)
        x_final, traj = jax.lax.scan(step, x, (idx, step_keys, drop_keys))

        return {
            "sample": x_final,
            "l_sample": jnp.concatenate([x[None], traj["x"]], axis=0),
            "mean": traj["mean"],
            "sigma": traj["sigma"],
            "logp": traj["logp"],
            "entropy": traj["entropy"],
            "logp_terminal": jnp.zeros((n_sample,), jnp.float32),
            "y": y,
        }


def karras_sample(diffusion: KarrasDenoiser, net, net_params, key, shape_nhwc,
                  steps: int, sampler: str = "heun", sigma_min: float = 0.002,
                  sigma_max: float = 80.0, rho: float = 7.0,
                  clip_denoised: bool = True, s_churn: float = 0.0,
                  s_tmin: float = 0.0, s_tmax: float = float("inf"),
                  s_noise: float = 1.0, model_kwargs=None):
    """Standalone EDM samplers (heun / euler / ancestral / onestep / dpm /
    multistep / progdist), the full surface of
    cm/karras_diffusion.py:354-719, as lax.scan loops. ``s_churn`` adds
    the EDM stochastic-churn noise injection on heun/euler/dpm steps
    (sample_heun, karras_diffusion.py:446-487)."""
    import numpy as np

    from dxmi_tpu.schedules import ancestral_split, karras_sigmas

    model_kwargs = model_kwargs or {}
    y = model_kwargs.get("y")
    sigmas = jnp.asarray(karras_sigmas(steps, sigma_min, sigma_max, rho))

    key, k0 = jax.random.split(key)
    x = jax.random.normal(k0, shape_nhwc) * sigma_max

    def denoise(xc, sigma):
        _, den = diffusion.denoise(net, net_params, xc,
                                   jnp.full((xc.shape[0],), sigma), y=y)
        return jnp.clip(den, -1, 1) if clip_denoised else den

    if sampler == "onestep":
        return denoise(x, sigmas[0])

    def churned(xc, s_i, k):
        # EDM stochastic churn (karras_diffusion.py:459-468): bump sigma
        # by gamma inside [s_tmin, s_tmax] and add matching noise.
        gamma = jnp.where((s_i >= s_tmin) & (s_i <= s_tmax),
                          min(s_churn / (len(sigmas) - 1), 2 ** 0.5 - 1),
                          0.0)
        sigma_hat = s_i * (1.0 + gamma)
        eps = jax.random.normal(k, xc.shape) * s_noise
        xc = xc + eps * jnp.sqrt(jnp.maximum(sigma_hat ** 2 - s_i ** 2, 0.0))
        return xc, sigma_hat

    if sampler in ("heun", "euler"):
        key, kc = jax.random.split(key)
        churn_keys = jax.random.split(kc, steps)

        def step(xc, i):
            s_i, s_n = sigmas[i], sigmas[i + 1]
            if s_churn > 0.0:
                xc, s_i = churned(xc, s_i, churn_keys[i])
            den = denoise(xc, s_i)
            d = (xc - den) / s_i
            x_e = xc + d * (s_n - s_i)
            if sampler == "euler":
                return x_e, None

            def heun_correct(x_e):
                den2 = denoise(x_e, s_n)
                d2 = (x_e - den2) / s_n
                return xc + 0.5 * (d + d2) * (s_n - s_i)

            x_next = jax.lax.cond(s_n == 0.0, lambda v: v, heun_correct, x_e)
            return x_next, None

        x, _ = jax.lax.scan(step, x, jnp.arange(steps - 1 + 1))
        return jnp.clip(x, -1, 1)

    if sampler == "ancestral":
        down, up = (jnp.asarray(a) for a in ancestral_split(np.asarray(sigmas)))
        keys = jax.random.split(key, steps)

        def step(xc, inputs):
            i, k = inputs
            den = denoise(xc, sigmas[i])
            d = (xc - den) / sigmas[i]
            x_next = xc + d * (down[i] - sigmas[i])
            x_next = x_next + jax.random.normal(k, xc.shape) * up[i]
            return x_next, None

        x, _ = jax.lax.scan(step, x, (jnp.arange(steps), keys))
        return jnp.clip(x, -1, 1)

    if sampler == "dpm":
        # DPM-Solver-2-style midpoint stepping in log-sigma space
        # (reference sample_dpm, karras_diffusion.py:521-560 shape)
        key, kc = jax.random.split(key)
        churn_keys = jax.random.split(kc, steps)

        def step(xc, i):
            s_i, s_n = sigmas[i], sigmas[i + 1]
            if s_churn > 0.0:
                xc, s_i = churned(xc, s_i, churn_keys[i])
            den = denoise(xc, s_i)
            d = (xc - den) / s_i
            sigma_mid = jnp.exp(0.5 * (jnp.log(s_i)
                                       + jnp.log(jnp.maximum(s_n, 1e-8))))

            def midpoint(_):
                x_mid = xc + d * (sigma_mid - s_i)
                den2 = denoise(x_mid, sigma_mid)
                d2 = (x_mid - den2) / sigma_mid
                return xc + d2 * (s_n - s_i)

            x_next = jax.lax.cond(s_n == 0.0,
                                  lambda _: xc + d * (s_n - s_i),
                                  midpoint, None)
            return x_next, None

        x, _ = jax.lax.scan(step, x, jnp.arange(steps))
        return jnp.clip(x, -1, 1)

    if sampler == "multistep":
        # stochastic iterative sampler over a ts sub-grid
        # (karras_diffusion.py:665-719 shape); ts defaults to all steps
        t_min, t_max = sigma_min, sigma_max
        rho_ = rho
        keys = jax.random.split(key, steps)

        def t_of(i):
            return (t_max ** (1 / rho_) + i / max(steps - 1, 1)
                    * (t_min ** (1 / rho_) - t_max ** (1 / rho_))) ** rho_

        ts_grid = jnp.asarray([t_of(i) for i in range(steps)])

        def step(xc, inputs):
            i, k = inputs
            t = ts_grid[i]
            den = denoise(xc, t)
            next_t = jnp.clip(ts_grid[jnp.minimum(i + 1, steps - 1)],
                              t_min, t_max)
            noise = jax.random.normal(k, xc.shape)
            x_next = den + noise * jnp.sqrt(
                jnp.maximum(next_t ** 2 - t_min ** 2, 0.0))
            return x_next, None

        x, _ = jax.lax.scan(step, x, (jnp.arange(steps), keys))
        return jnp.clip(x, -1, 1)

    if sampler == "progdist":
        # progressive-distillation sampling (karras_diffusion.py:378-381,
        # 686-719): a (steps+1)-point karras grid with the zero sigma
        # dropped, then plain Euler steps — never steps to sigma=0.
        sig = jnp.asarray(karras_sigmas(steps + 1, sigma_min, sigma_max,
                                        rho))[:-1]

        def step(xc, i):
            s_i, s_n = sig[i], sig[i + 1]
            den = denoise(xc, s_i)
            d = (xc - den) / s_i
            return xc + d * (s_n - s_i), None

        x, _ = jax.lax.scan(step, x, jnp.arange(steps))
        return jnp.clip(x, -1, 1)

    raise ValueError(f"unknown sampler: {sampler}")
