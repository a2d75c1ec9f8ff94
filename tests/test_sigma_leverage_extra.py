"""Sigma-shape, leverage, and obs-variance behaviors beyond the basics,
mirroring the reference's ``tests/test_sigma_to_y_cov_factor.py``,
``tests/test_perobservation_sigma.py``, and ``tests/test_leverage.py``
(SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mellon_tpu
from mellon_tpu import FunctionEstimator
from mellon_tpu.inference.conditionals import _sigma_to_y_cov_factor


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (50, 2), minval=-2, maxval=2)
    y = jnp.sin(x[:, 0]) + 0.5 * jnp.cos(2 * x[:, 1])
    return x, y


@pytest.fixture(scope="module")
def multi_output_data():
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (40, 2), minval=-2, maxval=2)
    Y = jnp.stack([jnp.sin(x[:, 0]), jnp.cos(x[:, 1])], axis=1)
    sigma = 0.05 + 0.1 * jax.random.uniform(jax.random.fold_in(key, 1), Y.shape)
    return x, Y, sigma


# --- _sigma_to_y_cov_factor units (reference test_sigma_to_y_cov_factor) ---


def test_scalar_sigma_factor():
    assert jnp.allclose(
        _sigma_to_y_cov_factor(0.5, None, 3), jnp.eye(3) * 0.5
    )


def test_vector_sigma_factor():
    s = jnp.array([1.0, 2.0, 3.0])
    assert jnp.allclose(_sigma_to_y_cov_factor(s, None, 3), jnp.diag(s))


def test_higher_dimensional_sigma_factor():
    s = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    expected = jnp.array(
        [[[1.0, 2.0], [0.0, 0.0]], [[0.0, 0.0], [3.0, 4.0]]]
    )
    assert jnp.allclose(_sigma_to_y_cov_factor(s, None, 2), expected)


def test_both_sigma_and_factor_raise():
    with pytest.raises(ValueError):
        _sigma_to_y_cov_factor(jnp.ones(3), jnp.eye(3), 3)


def test_neither_sigma_nor_factor_raise():
    with pytest.raises(ValueError):
        _sigma_to_y_cov_factor(None, None, 3)


# --- (n, p) sigma covariance semantics (reference test_perobservation) ----


def test_np_sigma_covariance_requires_noise_free(multi_output_data):
    x, Y, sigma = multi_output_data
    est = FunctionEstimator(
        sigma=sigma, n_landmarks=15, predictor_with_uncertainty=True
    )
    est.fit(x, Y)
    with pytest.raises(ValueError, match="noise_free"):
        est.predict.covariance(x[:5], diag=True)


def test_np_sigma_covariance_is_noise_free(multi_output_data):
    """The per-feature-sigma posterior covariance is epistemic only:
    independent of the sigma values, shape (n_test,)."""
    x, Y, sigma = multi_output_data
    est = FunctionEstimator(
        sigma=sigma, n_landmarks=15, predictor_with_uncertainty=True
    )
    est.fit(x, Y)
    cov = est.predict.covariance(x[:10], diag=True, noise_free=True)
    assert cov.shape == (10,)
    est2 = FunctionEstimator(
        sigma=sigma * 2.0, n_landmarks=15, predictor_with_uncertainty=True
    )
    est2.fit(x, Y)
    cov2 = est2.predict.covariance(x[:10], diag=True, noise_free=True)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(cov2), atol=1e-4)
    assert np.all(np.asarray(cov) >= -1e-6)


# --- leverage bounds / dependence (reference test_leverage) ---------------


def test_leverage_range_and_trace(data):
    x, y = data
    m = 15
    est = FunctionEstimator(sigma=0.1, n_landmarks=m)
    est.fit(x, y)
    h = np.asarray(est.leverage(x))
    assert np.all(h >= -1e-6)
    assert np.all(h <= 1 + 1e-6)
    # hat-matrix trace of the sparse GP is bounded by the landmark count
    assert h.sum() <= m + 1e-3


def test_leverage_sigma_dependence(data):
    """Higher observation noise lowers every leverage value."""
    x, y = data
    lo = FunctionEstimator(sigma=0.01, n_landmarks=15)
    lo.fit(x, y)
    hi = FunctionEstimator(sigma=1.0, n_landmarks=15)
    hi.fit(x, y)
    assert np.mean(np.asarray(lo.leverage(x))) > np.mean(
        np.asarray(hi.leverage(x))
    )


def test_leverage_before_fit_raises(data):
    x, _ = data
    est = FunctionEstimator(sigma=0.1)
    with pytest.raises((ValueError, AttributeError)):
        est.leverage(x)


# --- serialization interactions -------------------------------------------


def test_sigma_and_leverage_survive_serialization(data, tmp_path):
    x, y = data
    f = str(tmp_path / "p.json")
    est = FunctionEstimator(sigma=0.1, n_landmarks=15)
    est.fit(x, y)
    h_before = np.asarray(est.predict.leverage(x))
    est.predict.to_json(f)
    restored = mellon_tpu.Predictor.from_json(f)
    assert float(np.asarray(restored.sigma)) == pytest.approx(0.1)
    np.testing.assert_allclose(
        np.asarray(restored.leverage(x)), h_before, atol=1e-6
    )


def test_obs_variance_survives_serialization(data, tmp_path):
    x, y = data
    f = str(tmp_path / "p.json")
    est = FunctionEstimator(sigma=0.1, n_landmarks=15, obs_variance=True)
    est.fit(x, y)
    ov_before = np.asarray(est.get_obs_variance(x))
    assert np.all(np.isfinite(ov_before))
    est.predict.to_json(f)
    restored = mellon_tpu.Predictor.from_json(f)
    np.testing.assert_allclose(
        np.asarray(restored.obs_variance(x)), ov_before, atol=1e-6
    )


def test_obs_variance_error_when_not_computed(data):
    x, y = data
    est = FunctionEstimator(sigma=0.1, n_landmarks=15)
    est.fit(x, y)
    with pytest.raises(ValueError):
        est.predict.obs_variance(x)


def test_fit_obs_variance_override(data):
    """fit(obs_variance=True) overrides the constructor default."""
    x, y = data
    est = FunctionEstimator(sigma=0.1, n_landmarks=15)
    est.fit(x, y, obs_variance=True)
    assert np.all(np.isfinite(np.asarray(est.get_obs_variance(x))))


# --- review-fix regressions: sigma-shape dispatch in leverage/obs-variance ---


def test_per_observation_sigma_leverage_shape_full():
    """A per-observation (n,) sigma with 1-D y must yield an (n,) leverage
    and obs_variance surface, not (n, n) (reference dispatches on ndim alone,
    ``mellon/conditional.py:599-610``)."""
    key = jax.random.PRNGKey(7)
    n = 12
    x = jax.random.uniform(key, (n, 2), minval=-2, maxval=2)
    y = jnp.sin(x[:, 0])
    sigma = np.full((n,), 0.3)
    est = FunctionEstimator(sigma=sigma, obs_variance=True, gp_type="full")
    est.fit(x, y)
    h = np.asarray(est.predict.leverage(x))
    assert h.shape == (n,)
    assert h.min() >= 0.0 and h.max() <= 1.0
    ov = np.asarray(est.predict.obs_variance(x))
    assert ov.shape == (n,)

    # value check against the explicit heteroscedastic hat formula
    K = np.asarray(est.cov_func(x, x), dtype=np.float64)
    D = np.diag(sigma**2)
    h_exp = 1.0 - sigma**2 * np.diag(
        np.linalg.inv(K + D + float(est.jitter) * np.eye(n))
    )
    np.testing.assert_allclose(h, h_exp, atol=1e-4)


def test_per_observation_sigma_leverage_shape_sparse():
    """Sparse (landmarks) flavor of the same contract."""
    key = jax.random.PRNGKey(8)
    n = 40
    x = jax.random.uniform(key, (n, 2), minval=-2, maxval=2)
    y = jnp.sin(x[:, 0])
    sigma = np.full((n,), 0.3)
    est = FunctionEstimator(sigma=sigma, obs_variance=True, n_landmarks=15)
    est.fit(x, y)
    h = np.asarray(est.predict.leverage(x))
    assert h.shape == (n,)
    assert h.min() >= -1e-5 and h.max() <= 1.0 + 1e-5
    ov = np.asarray(est.predict.obs_variance(x))
    assert ov.shape == (n,)


def test_np_sigma_full_conditional_obs_variance_and_leverage():
    """(n, p) sigma on the full conditional: the obs-variance solve and
    leverage must vmap sigma over its FEATURE axis (the reference's
    ``in_axes=(0, 1)`` crashes for n != p, ``mellon/conditional.py:352``)."""
    from mellon_tpu.inference.conditionals import FullConditional
    from mellon_tpu.ops.kernels import Matern52

    key = jax.random.PRNGKey(9)
    n, p = 9, 3
    x = jax.random.uniform(key, (n, 2), minval=-2, maxval=2)
    Y = jnp.stack(
        [jnp.sin(x[:, 0]), jnp.cos(x[:, 1]), x[:, 0] * x[:, 1]], axis=1
    )
    sigma = 0.05 + 0.1 * jax.random.uniform(jax.random.fold_in(key, 1), (n, p))
    c = FullConditional(x, Y, 0.0, Matern52(1.0), sigma=sigma, obs_variance=True)
    h = np.asarray(c._leverage(x, sigma))
    assert h.shape == (n, p)
    ov = np.asarray(c._obs_variance(x))
    assert ov.shape == (n, p)
    assert np.all(np.isfinite(ov))


def test_landmarks_uncertainty_with_scalar_sigma_and_no_factor():
    """y_is_mean + with_uncertainty + sigma (no y_cov_factor) on the
    landmarks conditional must lift sigma to a covariance factor like the
    full conditional does — the reference crashes with a TypeError on the
    None factor (``mellon/conditional.py:582-584``)."""
    from mellon_tpu.inference.conditionals import LandmarksConditional
    from mellon_tpu.ops.kernels import Matern52

    key = jax.random.PRNGKey(10)
    x = jax.random.uniform(key, (30, 2), minval=-2, maxval=2)
    xu = x[::3]
    y = jnp.sin(x[:, 0])
    c = LandmarksConditional(
        x, xu, y, 0.0, Matern52(1.0), sigma=0.1,
        y_is_mean=True, with_uncertainty=True,
    )
    mc = np.asarray(c._mean_covariance(x[:5]))
    assert mc.shape == (5,)
    assert np.all(np.isfinite(mc))


def test_landmarks_uncertainty_per_feature_raises_informative():
    """Per-feature sigma + y_is_mean + with_uncertainty: no W factor exists
    (same contract as the full conditional); mean_covariance raises the
    informative _check_uncertainty error instead of the reference's crash
    on an undefined L_B (``mellon/conditional.py:583``)."""
    from mellon_tpu.inference.conditionals import LandmarksConditional
    from mellon_tpu.ops.kernels import Matern52

    key = jax.random.PRNGKey(11)
    x = jax.random.uniform(key, (30, 2), minval=-2, maxval=2)
    xu = x[::3]
    Y = jnp.stack([jnp.sin(x[:, 0]), jnp.cos(x[:, 1])], axis=1)
    c = LandmarksConditional(
        x, xu, Y, 0.0, Matern52(1.0), sigma=jnp.asarray([0.1, 0.2]),
        y_is_mean=True, with_uncertainty=True,
    )
    with pytest.raises(ValueError, match="without uncertainty"):
        c._mean_covariance(x[:5])


def test_default_sigma_zero_sparse_is_finite():
    """The documented default sigma=0 must condition near-noiselessly
    (sigma² floored at jitter, like add_variance on the full path) — the
    reference silently returns all-NaN sparse predictions here."""
    key = jax.random.PRNGKey(12)
    x = jax.random.uniform(key, (60, 2), minval=-2, maxval=2)
    y = jnp.sin(x[:, 0])
    est = FunctionEstimator(n_landmarks=15)  # sigma defaults to 0
    yp = est.fit_predict(x, y)
    assert bool(jnp.all(jnp.isfinite(yp)))
    assert float(jnp.sqrt(jnp.mean((yp - y) ** 2))) < 0.2


def test_default_sigma_zero_full_obs_variance_is_finite():
    """obs_variance with the default sigma=0 on the full path: the raw
    formula gives h=1 exactly and the HC3 correction divides by zero."""
    key = jax.random.PRNGKey(13)
    x = jax.random.uniform(key, (30, 2), minval=-2, maxval=2)
    y = jnp.sin(x[:, 0])
    est = FunctionEstimator(gp_type="full", obs_variance=True)
    est.fit(x, y)
    ov = np.asarray(est.predict.obs_variance(x))
    assert np.all(np.isfinite(ov))


def test_n1_sigma_is_per_observation():
    """(n, 1) sigma — the shape the ambiguity warning recommends — must be
    accepted as per-observation noise (the reference's own advice crashes
    in _process_sigma)."""
    key = jax.random.PRNGKey(14)
    n = 40
    x = jax.random.uniform(key, (n, 2), minval=-2, maxval=2)
    y = jnp.sin(x[:, 0])
    sigma_n1 = (0.1 + 0.2 * jax.random.uniform(jax.random.fold_in(key, 1), (n,)))[
        :, None
    ]
    est = FunctionEstimator(n_landmarks=12, sigma=sigma_n1)
    yp = est.fit_predict(x, y)
    assert bool(jnp.all(jnp.isfinite(yp)))
    # equals the 1-D per-observation fit
    est2 = FunctionEstimator(n_landmarks=12, sigma=jnp.ravel(sigma_n1))
    yp2 = est2.fit_predict(x, y)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yp2), atol=1e-6)
    # leverage works and is (n,)
    h = np.asarray(est.predict.leverage(x))
    assert h.shape == (n,)


def test_full_covariance_sigma_leverage_raises_informative():
    """A stored full-covariance (n, n) sigma fits, but leverage must raise
    the informative NotImplementedError instead of returning a wrong
    surface."""
    from mellon_tpu.inference.conditionals import LandmarksConditional
    from mellon_tpu.ops.kernels import Matern52

    key = jax.random.PRNGKey(15)
    n = 24
    x = jax.random.uniform(key, (n, 2), minval=-2, maxval=2)
    xu = x[::2]
    y = jnp.sin(x[:, 0])
    F = np.random.RandomState(0).randn(n, 3)
    Sigma = jnp.asarray(F @ F.T * 0.01 + 0.05 * np.eye(n))
    c = LandmarksConditional(x, xu, y, 0.0, Matern52(1.0), sigma=Sigma)
    with pytest.raises(NotImplementedError, match="full-covariance"):
        c._leverage(x, Sigma)


def test_full_conditional_leverage_rejects_wrong_count():
    """The full conditional's leverage is defined at the training geometry;
    a different point count raises a clear error instead of broadcasting
    garbage."""
    key = jax.random.PRNGKey(16)
    x = jax.random.uniform(key, (30, 2), minval=-2, maxval=2)
    y = jnp.sin(x[:, 0])
    est = FunctionEstimator(gp_type="full", sigma=0.1)
    est.fit(x, y)
    with pytest.raises(ValueError, match="training points"):
        est.predict.leverage(x[:10])


def test_cholesky_conditional_uncertainty_noisy_latents():
    """LandmarksConditionalCholesky with y_is_mean=False, L=None, and
    with_uncertainty=True: the W factor uses the original sigma (the
    reference crashes with eye * None)."""
    from mellon_tpu.inference.conditionals import LandmarksConditionalCholesky
    from mellon_tpu.ops.kernels import Matern52

    key = jax.random.PRNGKey(17)
    xu = jax.random.uniform(key, (12, 2), minval=-2, maxval=2)
    z = jax.random.normal(jax.random.fold_in(key, 1), (12,))
    c = LandmarksConditionalCholesky(
        xu, z, 0.0, Matern52(1.0), n_obs=40, sigma=0.5,
        y_is_mean=False, with_uncertainty=True,
    )
    mc = np.asarray(c._mean_covariance(xu[:5]))
    assert mc.shape == (5,)
    assert np.all(np.isfinite(mc))
