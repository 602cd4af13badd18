"""Golden-value and cross-check tests for schedule numerics."""
import numpy as np
import pytest

from dxmi_tpu import schedules as S
from tests.conftest import requires_reference

# The quadratic VAR eta schedule for T=10 is documented verbatim in the
# reference (models/DxMI/trainer.py:148-149 comment).
GOLDEN_ETA_T10 = np.array([
    1.00000e-04, 1.10250e-02, 4.00000e-02, 8.70250e-02, 1.52100e-01,
    2.35225e-01, 3.36400e-01, 4.55625e-01, 5.92900e-01, 7.48225e-01,
])


def test_ddpm_grid_basics():
    g = S.ddpm_grid()
    assert g.beta[0] == pytest.approx(1e-4)
    assert g.beta[-1] == pytest.approx(2e-2)
    assert np.all(np.diff(g.alpha_bar) < 0)
    # alpha_bar terminal for the 1000-step linear grid ~ 4.04e-5
    assert 1e-6 < g.alpha_bar[-1] < 1e-3
    # posterior variance beta_tilde_0 == beta_0 * 1/(1-alpha_bar_0) * (1-0)
    assert g.sigma[0] == pytest.approx(np.sqrt(g.beta[0] * (1 - 0) / (1 - g.alpha_bar[0])), rel=1e-5)


def test_var_noise_matches_golden_t10():
    eta = S.get_var_noise(10, "quadratic")
    np.testing.assert_allclose(eta, GOLDEN_ETA_T10, rtol=2e-3)
    # For S=10 the quadratic schedule saturates at the bisection domain's
    # right edge (0.95/sqrt(beta_0)/S), so only the inequality constraint
    # Gamma_bar[-1] >= Alpha_bar[-1] holds (the reference asserts exactly
    # this, var_sampler.py:128).
    g = S.ddpm_grid()
    assert np.prod(1 - eta) >= float(g.alpha_bar[-1])
    assert eta[-1] == pytest.approx(1e-4 * (1 + 9 * 9.5) ** 2, rel=1e-3)


def test_var_continuous_steps_monotone_decreasing():
    g = S.ddpm_grid()
    eta = S.get_var_noise(10, "quadratic")
    taus = S.precompute_var_steps(g, eta)
    assert len(taus) == 10
    assert np.all(np.diff(taus) < 0), taus
    # first step corresponds to Gamma_bar[-1] ~ 0.0208, which sits at
    # t ~ 617 on the 1000-step grid (the quadratic schedule saturates
    # before reaching the terminal alpha_bar)
    assert 500 < taus[0] < 1000
    assert abs(taus[-1]) < 0.5  # final step lands near t=0


@pytest.mark.parametrize("T", [4, 10])
def test_var_schedule_coefficients(T):
    sch = S.var_schedule(T)
    assert sch.x_mult.shape == (T,)
    # the last step maps to alpha_next=1: x_mult = 1/sqrt(gamma_bar[0])
    gbar0 = float(sch.gamma_bar[0])
    assert float(sch.x_mult[-1]) == pytest.approx(1.0 / np.sqrt(gbar0), rel=1e-4)
    # analytic final sigma is zero, init floor is 1e-3
    assert float(sch.sigma_q[-1]) == 0.0
    assert float(sch.init_sigma[-1]) == pytest.approx(1e-3)
    # all stds are valid
    assert np.all(np.asarray(sch.sigma_q) >= 0)
    assert np.all(np.isfinite(np.asarray(sch.eps_mult)))


def test_beta_schedules():
    lin = S.make_beta_schedule("linear", 10, 0.1, 1.0)
    assert lin[0] == pytest.approx(0.1) and lin[-1] == pytest.approx(1.0)
    const = S.make_beta_schedule("constant", 5, 0.3)
    np.testing.assert_allclose(const, 0.3, rtol=1e-6)
    quad = S.make_beta_schedule("quad", 10, 0.01, 1.0)
    assert quad[0] == pytest.approx(0.01, rel=1e-4)
    sig = S.make_beta_schedule("sigmoid", 10, 0.0, 1.0)
    assert sig[0] < 0.01 and sig[-1] > 0.99


def test_karras_sigmas():
    sig = S.karras_sigmas(10, 0.002, 80.0, 7.0)
    assert sig.shape == (11,)
    assert sig[0] == pytest.approx(80.0, rel=1e-5)
    assert sig[-2] == pytest.approx(0.002, rel=1e-4)
    assert sig[-1] == 0.0
    down, up = S.ancestral_split(sig)
    # terminal: sigma_to == 0 -> both zero
    assert down[-1] == 0.0 and up[-1] == 0.0
    # consistency: down^2 + up^2 == sigma_to^2
    np.testing.assert_allclose(down**2 + up**2, sig[1:] ** 2, atol=1e-8)


def test_karras_schedule_stochastic_last():
    reg = S.karras_schedule(4, stochastic_last=False)
    sto = S.karras_schedule(4, stochastic_last=True, rho=4.0)
    assert reg.sigmas.shape == (4,)
    assert sto.sigmas.shape == (4,)
    # default EDM grid ends at sigma=0 -> the final ancestral step is
    # deterministic; stochastic_last drops the trailing zero so the final
    # step still injects noise (reference openai_diffusion.py:29-32)
    assert float(reg.sigma_up[-1]) == 0.0
    assert float(sto.sigma_up[-1]) > 0.0


def test_extract_and_append_dims():
    import jax.numpy as jnp

    arr = jnp.arange(10.0)
    t = jnp.array([0, 3, 9])
    out = S.extract(arr, t, broadcast_ndim=4)
    assert out.shape == (3, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [0, 3, 9])

    x = jnp.ones((2, 3))
    assert S.append_dims(x, 5).shape == (2, 3, 1, 1, 1)


@pytest.mark.slow
@requires_reference
def test_var_machinery_vs_reference(reference_path):
    """Cross-check full VAR precompute against the reference implementation
    (imported read-only from the mounted snapshot — never vendored)."""
    import sys

    sys.path.insert(0, str(reference_path))
    try:
        from models.DxMI import var_sampler as ref
    finally:
        sys.path.pop(0)

    import torch

    for T in (4, 10):
        eta_ref = ref.get_VAR_noise(T, "quadratic")
        eta = S.get_var_noise(T, "quadratic")
        np.testing.assert_allclose(eta, eta_ref, rtol=1e-6)

        dh = ref.calc_diffusion_hyperparams(**ref.diffusion_config)
        # The reference documents numpy<2.0 (README.md:29), under which its
        # float32 scalars promote to float64 inside _log_cont_noise. Under
        # numpy>=2.0 they stay float32 and the flat-region bisection
        # degrades. Feed float64 Beta to replicate the documented behavior.
        dh64 = dict(dh)
        dh64["Beta"] = dh["Beta"].to(torch.float64)
        steps_ref = ref._precompute_VAR_steps(dh64, eta_ref)
        g = S.ddpm_grid()
        steps = S.precompute_var_steps(g, eta)
        np.testing.assert_allclose(steps, np.asarray(steps_ref), rtol=1e-4, atol=1e-2)

        if T == 4:
            # Reference quirk: VAR_get_params asserts abs(tau_last) < 0.1,
            # which even the float64 T=4 continuous steps violate
            # (tau_last ~ 0.497) — T=4 VARSampler is never exercised
            # upstream (T=4 CIFAR uses the DDGAN sampler). Only
            # _precompute_VAR_steps is comparable.
            continue

        xm_ref, thm_ref, std_ref, dsl_ref = ref.VAR_get_params(dh, eta_ref, 1.0, steps_ref)
        sch = S.var_schedule(T)
        np.testing.assert_allclose(np.asarray(sch.x_mult), xm_ref.numpy(), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(sch.eps_mult), thm_ref.numpy(), rtol=1e-3, atol=1e-5)
        # reference's std buffer stores 0.001 at the last step == our init_sigma
        np.testing.assert_allclose(np.asarray(sch.init_sigma), std_ref.numpy(), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sch.tau), dsl_ref.numpy(), rtol=1e-4, atol=1e-2)


def test_karras_vs_torch_float32():
    """The reference computes the sigma grid with torch float32 linspace
    (karras_diffusion.py:423-429). Replicate that arithmetic with torch
    directly (the reference module itself cannot be imported here: it pulls
    in torchvision) and check we agree to float32 precision."""
    torch = pytest.importorskip("torch")

    for n, rho in ((10, 7.0), (4, 4.0)):
        ramp = torch.linspace(0, 1, n)
        min_inv_rho = 0.002 ** (1 / rho)
        max_inv_rho = 80.0 ** (1 / rho)
        ref_s = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
        ref_s = torch.cat([ref_s, ref_s.new_zeros([1])]).numpy()
        ours = S.karras_sigmas(n, 0.002, 80.0, rho=rho)
        np.testing.assert_allclose(ours, ref_s, rtol=1e-5, atol=1e-7)


def test_trig_large_argument_accuracy():
    """ops/trig Cody-Waite reduction: float32 sin/cos stay ~1e-6-accurate
    vs float64 at DDPM/EDM timestep-embedding argument magnitudes
    (t up to ~1000, |rescaled_t| up to ~1550)."""
    import jax.numpy as jnp

    from dxmi_tpu.ops import trig

    x = np.linspace(-1600.0, 1600.0, 20011).astype(np.float32)
    ref_sin = np.sin(x.astype(np.float64))
    ref_cos = np.cos(x.astype(np.float64))
    assert np.abs(np.asarray(trig.sin(jnp.asarray(x))) - ref_sin).max() < 5e-6
    assert np.abs(np.asarray(trig.cos(jnp.asarray(x))) - ref_cos).max() < 5e-6
