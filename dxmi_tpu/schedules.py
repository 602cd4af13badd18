"""Diffusion schedule numerics (host-side precompute).

Everything in this module runs in numpy on the host, once, at setup time.
The results are frozen into small pytrees of ``jnp`` arrays that the jitted
samplers/trainers consume as per-step constants.

Capability parity targets (cited into /root/reference):
  * ``make_beta_schedule`` / ``extract``        — models/diffusion.py:5-22
  * DDPM 1000-step hyperparameter grid          — models/DxMI/var_sampler.py:19-45
  * VAR (user-defined variance) schedule solve  — models/DxMI/var_sampler.py:47-143
  * per-step ancestral coefficients             — models/DxMI/var_sampler.py:146-186
  * Karras sigma grid + ancestral split         — models/cm/karras_diffusion.py:423-444

The implementation below is an independent re-derivation of that math in
closed form where possible (e.g. ``Beta_tilde``/``Alpha_bar`` recurrences
are vectorised with ``cumprod`` rather than Python loops).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Generic beta schedules (reference: models/diffusion.py:5-15)
# ---------------------------------------------------------------------------


def make_beta_schedule(
    schedule: str = "linear",
    n_timesteps: int = 1000,
    start: float = 1e-5,
    end: float = 1e-2,
) -> np.ndarray:
    """Beta schedule used to model the cost-defining forward process q."""
    if schedule == "linear":
        betas = np.linspace(start, end, n_timesteps)
    elif schedule == "quad":
        betas = np.linspace(start**0.5, end**0.5, n_timesteps) ** 2
    elif schedule == "sigmoid":
        x = np.linspace(-6.0, 6.0, n_timesteps)
        betas = 1.0 / (1.0 + np.exp(-x)) * (end - start) + start
    elif schedule == "constant":
        betas = np.ones(n_timesteps) * start
    else:
        raise ValueError(f"unknown beta schedule: {schedule}")
    return betas.astype(np.float32)


def extract(arr: jnp.ndarray, t: jnp.ndarray, broadcast_ndim: int) -> jnp.ndarray:
    """Gather per-timestep scalars and reshape for broadcasting.

    ``arr``: (T,) constants, ``t``: (B,) integer timesteps. Returns
    (B, 1, 1, ..., 1) with ``broadcast_ndim`` total dims (reference:
    models/diffusion.py:18-22 gathers then reshapes against an image).
    """
    out = jnp.take(arr, t, axis=0)
    return out.reshape(out.shape[0], *([1] * (broadcast_ndim - 1)))


def append_dims(x: jnp.ndarray, target_ndim: int) -> jnp.ndarray:
    """Right-pad ``x`` with singleton dims until it has ``target_ndim`` dims
    (reference: models/cm/nn.py:96-104)."""
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(f"cannot reduce dims: {x.ndim} -> {target_ndim}")
    return x[(...,) + (None,) * dims_to_append]


# ---------------------------------------------------------------------------
# DDPM base grid (reference: models/DxMI/var_sampler.py:13-45)
# ---------------------------------------------------------------------------

DDPM_BETA_0 = 1e-4
DDPM_BETA_T = 2e-2
DDPM_T = 1000


@dataclasses.dataclass(frozen=True)
class DDPMGrid:
    """The 1000-step linear-beta DDPM reference grid (host numpy, float64
    internally for the schedule solve; stored as float32)."""

    T: int
    beta: np.ndarray        # (T,)
    alpha: np.ndarray       # (T,)
    alpha_bar: np.ndarray   # (T,)
    sigma: np.ndarray       # (T,) posterior std sqrt(beta_tilde)


@functools.lru_cache(maxsize=8)
def ddpm_grid(T: int = DDPM_T, beta_0: float = DDPM_BETA_0, beta_T: float = DDPM_BETA_T) -> DDPMGrid:
    # The reference builds these in float32 with an in-place loop
    # (var_sampler.py:33-40); cumprod in float32 matches it bit-for-bit
    # closely enough for the downstream bisection targets.
    beta = np.linspace(beta_0, beta_T, T, dtype=np.float32)
    alpha = 1.0 - beta
    alpha_bar = np.cumprod(alpha, dtype=np.float32)
    # beta_tilde_t = beta_t * (1 - alpha_bar_{t-1}) / (1 - alpha_bar_t)
    prev = np.concatenate([[0.0], alpha_bar[:-1]]).astype(np.float32)
    beta_tilde = beta * (1.0 - prev) / (1.0 - alpha_bar)
    sigma = np.sqrt(beta_tilde)
    return DDPMGrid(T=T, beta=beta, alpha=alpha, alpha_bar=alpha_bar, sigma=sigma)


# ---------------------------------------------------------------------------
# VAR schedule solve (reference: models/DxMI/var_sampler.py:47-143)
# ---------------------------------------------------------------------------


def bisearch(f: Callable[[float], float], domain: Tuple[float, float],
             target: float, eps: float = 1e-8, iters: int = 1000) -> float:
    """Bisection: smallest x in ``domain`` with f(x) ~ target, assuming f is
    decreasing in x (as the reference's products of (1 - beta) are)."""
    sign = -1.0 if target < 0 else 1.0
    left, right = domain
    x = (left + right) / 2.0
    for _ in range(iters):
        x = (left + right) / 2.0
        fx = f(x)
        if fx < target:
            right = x
        elif fx > (1.0 + sign * eps) * target:
            left = x
        else:
            break
    return x


def get_var_noise(S: int, schedule: str = "quadratic",
                  beta_0: float = DDPM_BETA_0, beta_T: float = DDPM_BETA_T,
                  T: int = DDPM_T) -> np.ndarray:
    """Solve for the S-step eta (per-step variance) schedule whose cumulative
    product of (1 - eta) matches the terminal alpha_bar of the 1000-step grid.
    """
    target = float(np.prod(1.0 - np.linspace(beta_0, beta_T, T)))

    if schedule == "linear":
        g = lambda x: np.linspace(beta_0, x, S)
        domain = (beta_0, 0.99)
    elif schedule == "quadratic":
        g = lambda x: beta_0 * (1.0 + np.arange(S) * x) ** 2
        domain = (0.0, 0.95 / math.sqrt(beta_0) / S)
    else:
        raise ValueError(f"unknown VAR schedule: {schedule}")

    f = lambda x: float(np.prod(1.0 - g(x)))
    largest = bisearch(f, domain, target, eps=1e-4)
    return g(largest)


def _log_gamma(x):
    """Stirling approximation of log Gamma(x + 1), matching the reference
    formula (var_sampler.py:100-103) so continuous timesteps agree."""
    y = np.float64(x) - 1.0
    return np.log(2.0 * np.pi * y) / 2.0 + y * (np.log(y) - 1.0) + np.log(1.0 + 1.0 / (12.0 * y))


def _log_cont_noise(t, beta_0, beta_T, T: int):
    """log alpha_bar as a continuous function of timestep t (via log-Gamma).

    NOTE on precision: this is evaluated in float64 deliberately. The
    function is nearly flat near t=0 (slope ~ -1e-4 per step) so the
    bisection root is precision-sensitive. The reference requires numpy<2.0
    (README.md:29), under which its float32 scalars promote to float64 here;
    under numpy>=2.0 (NEP 50) the reference's own computation degrades to
    float32 and its terminal-step assert (var_sampler.py:172) fails. We
    implement the documented (numpy<2.0, float64) behavior.
    """
    t = np.float64(t)
    beta_0 = np.float64(beta_0)
    beta_T = np.float64(beta_T)
    delta_beta = (beta_T - beta_0) / (T - 1)
    c = (1.0 - beta_0) / delta_beta
    t_1 = t + 1.0
    return t_1 * np.log(delta_beta) + _log_gamma(c + 1.0) - _log_gamma(c - t_1 + 1.0)


def precompute_var_steps(grid: DDPMGrid, user_defined_eta: np.ndarray) -> np.ndarray:
    """Map each VAR noise level to a continuous timestep on the 1000-step grid.

    Returned in *sampling order* (first entry = most-noisy step), matching the
    reference's ``continuous_steps`` list (var_sampler.py:115-143).
    """
    T_user = len(user_defined_eta)
    gamma_bar = np.cumprod(1.0 - user_defined_eta.astype(np.float32))
    assert gamma_bar[0] <= grid.alpha_bar[0] and gamma_bar[-1] >= grid.alpha_bar[-1]

    beta_0 = float(grid.beta[0])
    beta_T = float(grid.beta[-1])
    steps = []
    for t in range(T_user - 1, -1, -1):
        t_adapted = None
        # locate the bracketing pair on the discrete grid, then refine
        idx = np.searchsorted(-grid.alpha_bar, -gamma_bar[t])  # alpha_bar decreasing
        for i in range(max(0, idx - 2), grid.T - 1):
            if grid.alpha_bar[i] >= gamma_bar[t] > grid.alpha_bar[i + 1]:
                t_adapted = bisearch(
                    f=lambda _t: _log_cont_noise(_t, beta_0, beta_T, grid.T),
                    domain=(i - 0.01, i + 1.01),
                    target=float(np.log(gamma_bar[t])),
                )
                break
        if t_adapted is None:
            t_adapted = grid.T - 1
        steps.append(t_adapted)
    return np.asarray(steps, dtype=np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VarSchedule:
    """Frozen per-step constants for the VAR ancestral sampler.

    All arrays are shape (T,), indexed by sampling step i (i=0 is the most
    noisy step; i=T-1 produces x_0). ``lax.scan``/``jnp.take`` consume them.

    sigma_q[i] is the analytic ancestral noise std (0 for the final step —
    the sampler substitutes a learned or fixed floor there, reference
    var_sampler.py:180-183 stores 0.001 in its ``std`` buffer).
    """

    tau: jnp.ndarray                # continuous timestep fed to the U-Net
    x_mult: jnp.ndarray             # multiplier of x_prev
    eps_mult: jnp.ndarray           # multiplier of predicted noise ("theta")
    sigma_q: jnp.ndarray            # analytic ancestral std (last entry 0)
    init_sigma: jnp.ndarray         # std used to init log_betas (last = 1e-3)
    gamma_bar: jnp.ndarray          # cumulative products of (1 - eta)
    eta: jnp.ndarray                # user-defined per-step variance (q betas)


@functools.lru_cache(maxsize=16)
def var_schedule(n_timesteps: int, schedule: str = "quadratic",
                 kappa: float = 1.0, adhoc_scale1: float = 1.0,
                 adhoc_scale2: float = 1.0) -> VarSchedule:
    """Build the complete VAR sampling schedule for a T-step sampler.

    Mirrors VARSampler.init_schedule + VAR_get_params
    (reference var_sampler.py:146-186, 326-355) but emits a flat pytree of
    per-step constants so the whole T-step loop can be one ``lax.scan``.

    ``adhoc_scale1`` scales the noise-prediction term; ``adhoc_scale2``
    scales the init of the trainable sigmas (used by T=4 runs).
    """
    grid = ddpm_grid()
    eta = get_var_noise(n_timesteps, schedule)
    taus = precompute_var_steps(grid, eta)
    gamma_bar = np.cumprod(1.0 - eta.astype(np.float64))

    T = n_timesteps
    x_mult = np.zeros(T)
    eps_mult = np.zeros(T)
    sigma_q = np.zeros(T)
    init_sigma = np.zeros(T)
    for i in range(T):
        # sampling step i consumes noise level Gamma_bar[T-1-i]
        gbar = gamma_bar[T - 1 - i]
        if i == T - 1:
            alpha_next = 1.0
            sig = 0.0
            init_sigma[i] = 1e-3
        else:
            alpha_next = gamma_bar[T - 1 - i - 1]
            sig = kappa * math.sqrt(
                (1.0 - alpha_next) / (1.0 - gbar) * (1.0 - gbar / alpha_next)
            )
            init_sigma[i] = sig
        x_mult[i] = math.sqrt(alpha_next / gbar)
        eps_mult[i] = (
            math.sqrt(max(1.0 - alpha_next - sig**2, 0.0))
            - math.sqrt(1.0 - gbar) * x_mult[i]
        )
        sigma_q[i] = sig

    f32 = lambda a: jnp.asarray(np.asarray(a), dtype=jnp.float32)
    return VarSchedule(
        tau=f32(taus),
        x_mult=f32(x_mult),
        eps_mult=f32(eps_mult * adhoc_scale1),
        sigma_q=f32(sigma_q),
        init_sigma=f32(init_sigma * adhoc_scale2),
        gamma_bar=f32(gamma_bar),
        eta=f32(eta),
    )


# ---------------------------------------------------------------------------
# Karras / EDM schedule (reference: models/cm/karras_diffusion.py:423-444)
# ---------------------------------------------------------------------------


def karras_sigmas(n: int, sigma_min: float = 0.002, sigma_max: float = 80.0,
                  rho: float = 7.0) -> np.ndarray:
    """rho-spaced EDM sigma grid with a trailing zero, shape (n+1,)."""
    ramp = np.linspace(0.0, 1.0, n)
    min_inv_rho = sigma_min ** (1.0 / rho)
    max_inv_rho = sigma_max ** (1.0 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return np.concatenate([sigmas, [0.0]]).astype(np.float32)


def ancestral_split(sigmas: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Split consecutive sigma pairs into (sigma_down, sigma_up) for
    Euler-ancestral sampling. Input (T+1,) -> outputs (T,)."""
    sigma_from, sigma_to = sigmas[:-1], sigmas[1:]
    sigma_up = np.sqrt(
        sigma_to**2 * (sigma_from**2 - sigma_to**2) / np.maximum(sigma_from**2, 1e-20)
    )
    sigma_down = np.sqrt(np.maximum(sigma_to**2 - sigma_up**2, 0.0))
    return sigma_down.astype(np.float32), sigma_up.astype(np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KarrasSchedule:
    """Frozen per-step constants for the EDM Euler-ancestral policy
    (reference: models/DxMI/openai_diffusion.py:29-56)."""

    sigmas: jnp.ndarray        # (T,) sigma at each sampling step
    sigma_down: jnp.ndarray    # (T,)
    sigma_up: jnp.ndarray      # (T,) noise actually added
    sigma_max: float = dataclasses.field(metadata=dict(static=True))
    sigma_data: float = dataclasses.field(metadata=dict(static=True))


def karras_schedule(n_timesteps: int, sigma_min: float = 0.002,
                    sigma_max: float = 80.0, rho: float = 7.0,
                    stochastic_last: bool = False,
                    sigma_data: float = 0.5) -> KarrasSchedule:
    """Build the EDM policy schedule.

    ``stochastic_last`` keeps a non-zero terminal sigma by building an
    (n+1)-point grid and dropping the final zero (reference
    openai_diffusion.py:29-32).
    """
    if stochastic_last:
        full = karras_sigmas(n_timesteps + 1, sigma_min, sigma_max, rho)[:-1]
    else:
        full = karras_sigmas(n_timesteps, sigma_min, sigma_max, rho)
    down, up = ancestral_split(full)
    return KarrasSchedule(
        sigmas=jnp.asarray(full[:-1]),
        sigma_down=jnp.asarray(down),
        sigma_up=jnp.asarray(up),
        sigma_max=float(sigma_max),
        sigma_data=float(sigma_data),
    )


def edm_scalings(sigma: jnp.ndarray, sigma_data: float = 0.5):
    """EDM preconditioning (c_skip, c_out, c_in) — reference
    karras_diffusion.py:63-67."""
    c_skip = sigma_data**2 / (sigma**2 + sigma_data**2)
    c_out = sigma * sigma_data / jnp.sqrt(sigma**2 + sigma_data**2)
    c_in = 1.0 / jnp.sqrt(sigma**2 + sigma_data**2)
    return c_skip, c_out, c_in


def edm_rescaled_t(sigma: jnp.ndarray) -> jnp.ndarray:
    """Timestep conditioning fed to the ADM U-Net — reference
    karras_diffusion.py:347."""
    return 1000.0 * 0.25 * jnp.log(sigma + 1e-44)
