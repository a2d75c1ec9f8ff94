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
