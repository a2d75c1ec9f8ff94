"""TimeSensitiveDensityEstimator tests, mirroring the reference's
``tests/test_time_sensitive_density_estimator.py`` strategy (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mellon_tpu import TimeSensitiveDensityEstimator


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(0)
    n_per = 40
    xs, ts = [], []
    for i, t in enumerate([0.0, 1.0, 2.0]):
        shift = 0.5 * t
        xs.append(
            jax.random.normal(jax.random.fold_in(key, i), (n_per, 2)) + shift
        )
        ts.append(jnp.full(n_per, t))
    return jnp.concatenate(xs), jnp.concatenate(ts)


@pytest.fixture(scope="module")
def fitted(data):
    x, times = data
    est = TimeSensitiveDensityEstimator(ls_time=1.5)
    est.fit(x, times)
    return est


def test_fit_shapes(data, fitted):
    x, _ = data
    assert fitted.log_density_x.shape == (x.shape[0],)
    assert fitted.x.shape == (x.shape[0], 3)  # time column appended


def test_product_kernel(fitted):
    # space x time product kernel with separate length scales
    rep = repr(fitted.cov_func)
    assert "*" in rep


def test_predict_at_time(data, fitted):
    x, times = data
    pred = fitted.predict(x[:10], time=0.0)
    assert pred.shape == (10,)
    assert np.all(np.isfinite(np.asarray(pred)))
    # scalar time is broadcast
    pred1 = fitted.predict(x[:10], time=jnp.zeros(10))
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred1), atol=1e-12)


def test_predictor_consistency(data, fitted):
    x, times = data
    pred = fitted.predict(x, time=times)
    ld = np.asarray(fitted.log_density_x)
    rel_err = np.max(np.abs(ld - np.asarray(pred))) / np.std(ld)
    assert rel_err < 1e-3


def test_multi_time(data, fitted):
    x, _ = data
    grid = jnp.asarray([0.0, 1.0, 2.0])
    preds = fitted.predict(x[:7], multi_time=grid)
    assert preds.shape == (7, 3)


def test_time_derivative(data, fitted):
    x, _ = data
    td = fitted.predict.time_derivative(x[:9], 1.0)
    assert td.shape == (9,)
    assert np.all(np.isfinite(np.asarray(td)))


def test_gradient_at_time(data, fitted):
    x, _ = data
    g = fitted.predict.gradient(x[:5], 1.0)
    assert g.shape == (5, 2)


def test_n_obs_average_cell_count(data, fitted):
    # predictor n_obs = average cells per time point
    assert fitted.predict.n_obs == pytest.approx(40.0)


def test_normalize_per_time_point(data):
    x, times = data
    est = TimeSensitiveDensityEstimator(ls_time=1.5, normalize_per_time_point=True)
    ld = est.fit_predict(x, times)
    assert np.all(np.isfinite(np.asarray(ld)))


def test_ls_time_heuristic(data):
    """Full auto ls_time estimation: nested per-time density fits."""
    x, times = data
    est = TimeSensitiveDensityEstimator()
    est.fit(x, times)
    assert est.ls_time is not None
    assert est.ls_time > 0


def test_too_few_samples_per_time_raises():
    x = jnp.ones((5, 2))
    times = jnp.asarray([0.0, 0.0, 1.0, 1.0, 2.0])
    est = TimeSensitiveDensityEstimator(ls_time=1.0)
    with pytest.raises(ValueError, match="Insufficient data"):
        est.fit(x, times)
