"""Math-identity tests for the conditional-GP formulas: the compact
Cholesky/solve implementations must equal the explicit textbook expressions
(the reference validates leverage this way, ``tests/test_leverage.py``; here
the posterior mean/covariance and sparse corrections get the same
treatment)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mellon_tpu.inference.conditionals import (
    FullConditional,
    LandmarksConditional,
    LandmarksConditionalCholesky,
)
from mellon_tpu.ops.kernels import Matern52
from mellon_tpu.utils.util import stabilize


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (40, 2), minval=-2, maxval=2)
    xu = x[:12]
    xnew = jax.random.uniform(jax.random.PRNGKey(1), (7, 2), minval=-2, maxval=2)
    y = jnp.sin(x[:, 0]) * jnp.cos(x[:, 1])
    cov = Matern52(ls=1.5)
    return x, xu, xnew, y, cov


def test_full_conditional_mean_is_gp_regression(setup):
    x, _, xnew, y, cov = setup
    sigma = 0.1
    c = FullConditional(
        x, y, 0.0, cov, sigma=sigma, y_is_mean=False, with_uncertainty=True
    )
    K = np.asarray(cov(x, x))
    Ks = np.asarray(cov(xnew, x))
    jitter = c.jitter
    # noise enters via add_variance: K + sigma^2 I (diagonal floored at jitter)
    Knoise = K + max(sigma**2, jitter) * np.eye(40)
    expected = Ks @ np.linalg.solve(Knoise, np.asarray(y))
    got = np.asarray(c._mean(xnew))
    np.testing.assert_allclose(got, expected, atol=1e-8)


def test_full_conditional_covariance_identity(setup):
    x, _, xnew, y, cov = setup
    sigma = 0.1
    c = FullConditional(
        x, y, 0.0, cov, sigma=sigma, y_is_mean=False, with_uncertainty=True
    )
    K = np.asarray(cov(x, x))
    Ks = np.asarray(cov(xnew, x))
    Kss = np.asarray(cov(xnew, xnew))
    Knoise = K + max(sigma**2, c.jitter) * np.eye(40)
    expected = Kss - Ks @ np.linalg.solve(Knoise, Ks.T)
    got = np.asarray(c._covariance(xnew, diag=False))
    np.testing.assert_allclose(got, expected, atol=1e-8)
    # diag variant matches the full matrix diagonal
    got_diag = np.asarray(c._covariance(xnew, diag=True))
    np.testing.assert_allclose(got_diag, np.diag(got), atol=1e-8)


def test_landmarks_conditional_is_sor_regression(setup):
    """The sparse solve equals the explicit subset-of-regressors posterior
    mean: w = Kuu^-1-free form (sigma² Kuu + Kuf Kfu)^-1 Kuf y."""
    x, xu, xnew, y, cov = setup
    sigma = 0.2
    c = LandmarksConditional(
        x, xu, y, 0.0, cov, sigma=sigma, y_is_mean=False, with_uncertainty=True
    )
    Kuf = np.asarray(cov(xu, x))
    Kuu = np.asarray(stabilize(cov(xu, xu), c.jitter))
    Ksu = np.asarray(cov(xnew, xu))
    M = sigma**2 * Kuu + Kuf @ Kuf.T
    # small extra jitter enters through the B-matrix stabilization; solve
    # explicitly for comparison
    weights_expected = np.linalg.solve(M, Kuf @ np.asarray(y))
    expected = Ksu @ weights_expected
    got = np.asarray(c._mean(xnew))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_landmarks_conditional_covariance_parts(setup):
    x, xu, xnew, y, cov = setup
    sigma = 0.2
    c = LandmarksConditional(
        x, xu, y, 0.0, cov, sigma=sigma, y_is_mean=False, with_uncertainty=True
    )
    Kss_diag = np.asarray(cov.diag(xnew))
    var = np.asarray(c._covariance(xnew, diag=True))
    # posterior variance is bounded by the prior variance and positive
    assert np.all(var > 0)
    assert np.all(var <= Kss_diag + 1e-8)
    # full covariance consistent with diag
    full = np.asarray(c._covariance(xnew, diag=False))
    np.testing.assert_allclose(np.diag(full), var, atol=1e-8)


def test_landmarks_cholesky_mean_matches_whitened_function(setup):
    """weights = Lp^-T z reproduces the GP mean through k(x*, xu):
    at the landmarks themselves the mean equals L z (the whitened sample)."""
    x, xu, xnew, y, cov = setup
    key = jax.random.PRNGKey(3)
    z = jax.random.normal(key, (12,))
    c = LandmarksConditionalCholesky(
        xu, z, 0.0, cov, n_obs=40, y_is_mean=True, with_uncertainty=True
    )
    Lp = np.linalg.cholesky(np.asarray(stabilize(cov(xu, xu), c.jitter)))
    f_at_landmarks = Lp @ np.asarray(z)
    got = np.asarray(c._mean(xu))
    # k(xu, xu) @ Kuu^-1 @ f = f (exact interpolation at the landmarks,
    # up to the jitter regularization)
    np.testing.assert_allclose(got, f_at_landmarks, atol=1e-4)


def test_mean_covariance_pushforward(setup):
    """_mean_covariance equals (Kus W)(Kus W)^T with W = Lp^-T diag(std)."""
    x, xu, xnew, y, cov = setup
    key = jax.random.PRNGKey(4)
    z = jax.random.normal(key, (12,))
    std = 0.1 + 0.2 * jax.random.uniform(jax.random.PRNGKey(5), (12,))
    c = LandmarksConditionalCholesky(
        xu, z, 0.0, cov, n_obs=40, sigma=std, y_is_mean=True,
        with_uncertainty=True,
    )
    Lp = np.linalg.cholesky(np.asarray(stabilize(cov(xu, xu), c.jitter)))
    W = np.linalg.solve(Lp.T, np.diag(np.asarray(std)))
    Ksu = np.asarray(cov(xnew, xu))
    expected = (Ksu @ W) @ (Ksu @ W).T
    got = np.asarray(c._mean_covariance(xnew, diag=False))
    np.testing.assert_allclose(got, expected, atol=1e-8)
    got_diag = np.asarray(c._mean_covariance(xnew, diag=True))
    np.testing.assert_allclose(got_diag, np.diag(expected), atol=1e-8)


# ---------------------------------------------------------------------------
# f32-singular rescue branches (host-f64 weights / landmark pruning)
# ---------------------------------------------------------------------------


@pytest.fixture
def propagate_logs():
    """The package logger has propagate=False (own stdout handler); caplog
    needs propagation on to observe records."""
    import logging

    logger = logging.getLogger("mellon_tpu")
    logger.propagate = True
    yield
    logger.propagate = False


@pytest.fixture
def singular_f32():
    """f32 operands whose landmark kernel is numerically singular in f32:
    ls far above the data spread makes K(xu, xu) ~ all-ones."""
    rs = np.random.RandomState(7)
    x32 = jnp.asarray(rs.randn(300, 3), dtype=jnp.float32)
    xu32 = jnp.asarray(rs.randn(120, 3), dtype=jnp.float32)
    y32 = jnp.sin(x32[:, 0]).astype(jnp.float32)
    return x32, xu32, y32, Matern52(40.0)


def _f64_sparse_weights(cov, x32, xu32, r, A_scale=None, r_scale=None):
    """Independent f64 ground truth of the sparse-GP weight solve with
    the same jitter escalation the rescue uses."""
    m = xu32.shape[0]
    K = np.asarray(cov(xu32, xu32), dtype=np.float64)
    Kuf = np.asarray(cov(xu32, x32), dtype=np.float64)
    jit64 = 1e-12
    while True:
        try:
            Lp = np.linalg.cholesky(K + jit64 * np.eye(m))
            break
        except np.linalg.LinAlgError:
            jit64 *= 10
    A = np.linalg.solve(Lp, Kuf)
    A_l = A if A_scale is None else A / A_scale
    r_l = r if r_scale is None else r / r_scale
    L_B = np.linalg.cholesky(A_l @ A.T + np.eye(m))
    c = np.linalg.solve(L_B, A @ r_l)
    return np.linalg.solve(Lp.T, np.linalg.solve(L_B.T, c))


def test_host_rescue_y_is_mean_branch(singular_f32):
    """y_is_mean=True rescue: weights solve with no sigma weighting.
    sigma=0.1 pins the host-rescue branch (noise-free mean reconditioning
    now prefers the on-device prune); the y_is_mean weights math itself
    ignores sigma."""
    x32, xu32, y32, cov = singular_f32
    c = LandmarksConditional(
        x32, xu32, y32, 0.0, cov, sigma=0.1, y_is_mean=True
    )
    w64 = _f64_sparse_weights(cov, x32, xu32, np.asarray(y32, np.float64))
    Ksu = np.asarray(cov(x32[:40], xu32), dtype=np.float64)
    expected = Ksu @ w64
    got = np.asarray(c._mean(x32[:40]), dtype=np.float64)
    scale = float(np.abs(expected).max())
    np.testing.assert_allclose(got, expected, atol=2e-3 * scale)


def test_host_rescue_full_covariance_sigma_branch(singular_f32):
    """(n, n) covariance-matrix sigma rescue matches the f64 formula."""
    x32, xu32, y32, cov = singular_f32
    n = x32.shape[0]
    rs = np.random.RandomState(11)
    F = rs.randn(n, 3).astype(np.float64)
    Sigma = F @ F.T * 0.01 + 0.05 * np.eye(n)
    c = LandmarksConditional(
        x32, xu32, y32, 0.0, cov,
        sigma=jnp.asarray(Sigma, dtype=jnp.float32),
    )
    # f64 ground truth: whiten by chol(Sigma + jitter I)
    jitter = float(c.jitter)
    L_s = np.linalg.cholesky(Sigma + jitter * np.eye(n))
    m = xu32.shape[0]
    K = np.asarray(cov(xu32, xu32), dtype=np.float64)
    Kuf = np.asarray(cov(xu32, x32), dtype=np.float64)
    jit64 = 1e-12
    while True:
        try:
            Lp = np.linalg.cholesky(K + jit64 * np.eye(m))
            break
        except np.linalg.LinAlgError:
            jit64 *= 10
    A = np.linalg.solve(Lp, Kuf)
    r = np.asarray(y32, np.float64)
    r_l = np.linalg.solve(L_s.T, np.linalg.solve(L_s, r))
    A_l = np.linalg.solve(L_s.T, np.linalg.solve(L_s, A.T)).T
    L_B = np.linalg.cholesky(A_l @ A.T + np.eye(m))
    cc = np.linalg.solve(L_B, A @ r_l)
    w64 = np.linalg.solve(Lp.T, np.linalg.solve(L_B.T, cc))
    Ksu = np.asarray(cov(x32[:40], xu32), dtype=np.float64)
    expected = Ksu @ w64
    got = np.asarray(c._mean(x32[:40]), dtype=np.float64)
    scale = float(np.abs(expected).max())
    np.testing.assert_allclose(got, expected, atol=5e-3 * scale)


def test_oversized_rescue_falls_back_to_pruning(singular_f32, monkeypatch):
    """When Kuf exceeds the host-transfer budget the conditional prunes
    redundant landmarks instead of shipping data to the host; predictions
    must stay close to the f64 answer."""
    import mellon_tpu.inference.conditionals as C

    x32, xu32, y32, cov = singular_f32
    monkeypatch.setattr(C, "HOST_F64_BUDGET", 10)
    c = LandmarksConditional(x32, xu32, y32, 0.0, cov, sigma=0.1)
    assert c.landmarks.shape[0] < xu32.shape[0]  # actually pruned
    w64 = _f64_sparse_weights(
        cov, x32, xu32, np.asarray(y32, np.float64) / 0.01, A_scale=0.01
    )
    Ksu = np.asarray(cov(x32[:40], xu32), dtype=np.float64)
    expected = Ksu @ w64
    got = np.asarray(c._mean(x32[:40]), dtype=np.float64)
    scale = float(np.abs(expected).max())
    np.testing.assert_allclose(got, expected, atol=0.05 * scale)


def test_host_rescue_leverage_stays_physical(singular_f32):
    """Leverage under an f32-singular landmark kernel must stay in [0, 1]:
    the f32 inverse of M = sigma²K_uu + BᵀB is corrupted by the ~1e12
    condition number (observed h < -1, which poisons the HC3 obs-variance
    correction); the range-checked host-f64 fallback restores it."""
    x32, xu32, y32, cov = singular_f32
    c = LandmarksConditional(
        x32, xu32, y32, 0.0, cov, sigma=0.1,
        obs_variance=True, with_uncertainty=True,
    )
    h = np.asarray(c._leverage(x32[:50], 0.1))
    assert h.min() >= 0.0
    assert h.max() <= 1.0
    # per-feature sigma flavor returns (n, p) in range too
    h2 = np.asarray(
        c._leverage(x32[:50], jnp.asarray([0.1, 0.3], dtype=jnp.float32))
    )
    assert h2.shape == (50, 2)
    assert h2.min() >= 0.0 and h2.max() <= 1.0
    # obs-variance built through the same hat diagonal stays finite
    ov = np.asarray(c._obs_variance(x32[:20]))
    assert np.all(np.isfinite(ov))


def test_full_covariance_sigma_on_landmarks_path(setup):
    """(n, n) covariance sigma on the sparse (m != n) conditional: the
    whitening must run against A's observation axis (the reference's own
    branch is shape-inconsistent here, mellon/conditional.py:175)."""
    x, xu, xnew, y, cov = setup
    n = x.shape[0]
    rs = np.random.RandomState(9)
    F = rs.randn(n, 3)
    Sigma = F @ F.T * 0.01 + 0.05 * np.eye(n)
    c = LandmarksConditional(x, xu, y, 0.0, cov, sigma=jnp.asarray(Sigma))
    got = np.asarray(c._mean(xnew), dtype=np.float64)

    # f64 ground truth
    K = np.asarray(cov(xu, xu), dtype=np.float64)
    Kuf = np.asarray(cov(xu, x), dtype=np.float64)
    Lp = np.linalg.cholesky(K + float(c.jitter) * np.eye(K.shape[0]))
    A = np.linalg.solve(Lp, Kuf)
    L_s = np.linalg.cholesky(Sigma + float(c.jitter) * np.eye(n))
    r_l = np.linalg.solve(L_s.T, np.linalg.solve(L_s, np.asarray(y)))
    A_l = np.linalg.solve(L_s.T, np.linalg.solve(L_s, A.T)).T
    L_B = np.linalg.cholesky(A_l @ A.T + np.eye(K.shape[0]))
    cc = np.linalg.solve(L_B, A @ r_l)
    w = np.linalg.solve(Lp.T, np.linalg.solve(L_B.T, cc))
    expected = np.asarray(cov(xnew, xu), dtype=np.float64) @ w
    scale = float(np.abs(expected).max())
    np.testing.assert_allclose(got, expected, atol=1e-5 * scale)


def test_host_rescue_rejects_lengthn_sigma_with_multioutput(singular_f32):
    """(n,)-sigma with 2-D y is unsupported on the device path; the host
    rescue must reject it identically instead of mis-broadcasting."""
    from mellon_tpu.inference.conditionals import _host_f64_landmarks_weights

    x32, xu32, y32, cov = singular_f32
    n = x32.shape[0]
    Y = jnp.stack([y32, -y32], axis=1)
    K = cov(xu32, xu32)
    Kuf = cov(xu32, x32)
    with pytest.raises(ValueError, match="sigma"):
        _host_f64_landmarks_weights(
            K, Kuf, Y, jnp.full((n,), 0.1), 1e-6, False, False
        )


def test_host_rescue_uncertainty_factors_accurate(singular_f32):
    """with_uncertainty through the host rescue: W comes from the f64
    factors, so mean_covariance matches an independent f64 computation."""
    x32, xu32, y32, cov = singular_f32
    m = xu32.shape[0]
    rs = np.random.RandomState(13)
    y_cov_factor = jnp.asarray(
        np.diag(0.1 + 0.1 * rs.rand(x32.shape[0])), dtype=jnp.float32
    )
    c = LandmarksConditional(
        x32, xu32, y32, 0.0, cov, sigma=0.1,
        y_is_mean=True, with_uncertainty=True, y_cov_factor=y_cov_factor,
    )
    mc = np.asarray(c._mean_covariance(x32[:30], diag=True))
    assert np.all(np.isfinite(mc))
    assert np.all(mc >= -1e-6)

    # independent f64 W
    K = np.asarray(cov(xu32, xu32), dtype=np.float64)
    Kuf = np.asarray(cov(xu32, x32), dtype=np.float64)
    jit64 = 1e-12
    while True:
        try:
            Lp = np.linalg.cholesky(K + jit64 * np.eye(m))
            break
        except np.linalg.LinAlgError:
            jit64 *= 10
    A = np.linalg.solve(Lp, Kuf)
    L_B = np.linalg.cholesky(A @ A.T + np.eye(m))
    yl = np.asarray(y_cov_factor, dtype=np.float64)
    W = np.linalg.solve(
        Lp.T, np.linalg.solve(L_B.T, np.linalg.solve(L_B, A @ yl))
    )
    Ksu = np.asarray(cov(x32[:30], xu32), dtype=np.float64)
    expected = np.sum((Ksu @ W) ** 2, axis=1)
    scale = float(np.abs(expected).max())
    np.testing.assert_allclose(
        np.asarray(mc, dtype=np.float64), expected, atol=5e-3 * scale
    )


def test_noise_free_mean_prefers_prune_over_rescue(singular_f32, caplog, propagate_logs):
    """The density models' Nyström reconditioning (y_is_mean, sigma=None,
    no uncertainty factor) takes the on-device pivoted prune instead of the
    host-f64 rescue, and stays within tolerance of the f64 solve."""
    import logging

    x32, xu32, y32, cov = singular_f32
    with caplog.at_level(logging.WARNING, logger="mellon_tpu"):
        c = LandmarksConditional(
            x32, xu32, y32, 0.0, cov, sigma=None, y_is_mean=True
        )
    messages = " ".join(r.message for r in caplog.records)
    assert "pruning" in messages
    assert "host in float64" not in messages
    got = np.asarray(c._mean(x32), dtype=np.float64)

    # f64 noise-free ground truth on all landmarks
    from scipy.linalg import solve_triangular as trsm

    m = xu32.shape[0]
    K = np.asarray(cov(xu32, xu32), dtype=np.float64)
    Kuf = np.asarray(cov(xu32, x32), dtype=np.float64)
    hj = 1e-6
    Lp = None
    for _ in range(8):
        try:
            Lp = np.linalg.cholesky(K + hj * np.eye(m))
            break
        except np.linalg.LinAlgError:
            hj *= 10
    A = trsm(Lp, Kuf, lower=True)
    LB = np.linalg.cholesky(np.eye(m) + A @ A.T)
    cc = trsm(LB, A @ np.asarray(y32, dtype=np.float64), lower=True)
    w = trsm(Lp.T, trsm(LB.T, cc))
    want = Kuf.T @ w
    rmse = np.sqrt(((got - want) ** 2).mean())
    assert rmse < 0.02 * want.std()
