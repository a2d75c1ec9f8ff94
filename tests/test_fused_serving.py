"""Fused serving-path programs must equal their eager formulations.

The predictor evaluations (conditional mean, diag covariance,
mean-covariance, obs-variance) run as spec-keyed jitted programs on the
serving path (`mellon_tpu/inference/conditionals.py`); these tests pin
the fused programs against the plain eager math for every kernel with an
operand spec, and that kernels WITHOUT a spec (composites, user-defined)
take the eager fallback and still agree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from mellon_tpu.inference.conditionals import (
    _conditional_cov_diag,
    _conditional_cov_diag2,
    _conditional_mean,
    _conditional_mean_cov_diag,
)
from mellon_tpu.ops.kernels import (
    Covariance,
    ExpQuad,
    Exponential,
    Linear,
    Matern32,
    Matern52,
    RatQuad,
)

class _SpecLessRBF(Covariance):
    """User-defined kernel WITHOUT an operand spec: exercises the eager
    fallback branch of every fused serving helper (operand_spec raises
    NotImplementedError, exactly like a downstream subclass would)."""

    def __init__(self, ls=1.0):
        super().__init__()
        self.ls = ls

    def k(self, x, y):
        sq = jnp.sum((x[..., None, :] - y[..., None, :, :]) ** 2, axis=-1)
        return jnp.exp(-0.5 * sq / self.ls**2)


KERNELS = [
    Matern32(1.3),
    Matern52(0.8),
    ExpQuad(2.1),
    Exponential(1.1),
    RatQuad(1.9),
    Linear(1.5),
    Matern52(1.2) * Matern32(0.7),   # composite (Mul spec)
    Matern52(1.2) + Linear(2.0),     # composite (Add spec)
    _SpecLessRBF(1.4),               # no spec: eager fallback branch
]


@pytest.fixture(scope="module")
def operands():
    rs = np.random.RandomState(0)
    Xnew = jnp.asarray(rs.randn(23, 3))
    base = jnp.asarray(rs.randn(17, 3))
    weights = jnp.asarray(rs.randn(17))
    W = jnp.asarray(rs.randn(17, 5))
    A = jnp.asarray(rs.randn(17, 17))
    L = jnp.linalg.cholesky(A @ A.T + 17 * jnp.eye(17))
    B = jnp.asarray(rs.randn(17, 17))
    Cs = jnp.linalg.cholesky(B @ B.T + 17 * jnp.eye(17))
    return Xnew, base, weights, W, L, Cs


@pytest.mark.parametrize("cov", KERNELS, ids=lambda c: repr(c)[:40])
def test_fused_mean_matches_eager(cov, operands):
    Xnew, base, weights, _, _, _ = operands
    fused = _conditional_mean(cov, Xnew, base, weights, 1.5)
    eager = 1.5 + cov(Xnew, base) @ weights
    np.testing.assert_allclose(fused, eager, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("cov", KERNELS, ids=lambda c: repr(c)[:40])
def test_fused_cov_diag_matches_eager(cov, operands):
    Xnew, base, _, _, L, Cs = operands
    fused = _conditional_cov_diag(cov, Xnew, base, L)
    K = cov(base, Xnew)
    A = solve_triangular(L, K, lower=True)
    eager = cov.diag(Xnew) - jnp.sum(jnp.square(A), axis=0)
    np.testing.assert_allclose(fused, eager, rtol=1e-6, atol=1e-8)

    fused2 = _conditional_cov_diag2(cov, Xnew, base, L, Cs)
    C = solve_triangular(Cs, K, lower=True)
    eager2 = eager + jnp.sum(jnp.square(C), axis=0)
    np.testing.assert_allclose(fused2, eager2, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("cov", KERNELS, ids=lambda c: repr(c)[:40])
def test_fused_mean_cov_diag_matches_eager(cov, operands):
    Xnew, base, _, W, _, _ = operands
    fused = _conditional_mean_cov_diag(cov, Xnew, base, W)
    cov_L = cov(Xnew, base) @ W
    eager = jnp.sum(cov_L * cov_L, axis=1)
    np.testing.assert_allclose(fused, eager, rtol=1e-6, atol=1e-8)


def test_multioutput_weights(operands):
    """(m, p) weights — the FunctionEstimator multi-output case."""
    Xnew, base, _, W, _, _ = operands
    cov = Matern52(1.0)
    fused = _conditional_mean(cov, Xnew, base, W, 0.0)
    eager = cov(Xnew, base) @ W
    np.testing.assert_allclose(fused, eager, rtol=1e-6, atol=1e-8)


def test_active_dims_kernel(operands):
    """The space x time product kernel (active_dims) used by the
    time-sensitive model."""
    Xnew, base, weights, _, _, _ = operands
    cov = Matern52(1.1, active_dims=slice(None, -1)) * Matern32(
        0.9, active_dims=-1
    )
    fused = _conditional_mean(cov, Xnew, base, weights, -0.5)
    eager = -0.5 + cov(Xnew, base) @ weights
    np.testing.assert_allclose(fused, eager, rtol=1e-6, atol=1e-8)
