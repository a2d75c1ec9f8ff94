"""DimensionalityEstimator tests, mirroring the reference's
``tests/test_dimensionality_estimator.py`` strategy (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mellon_tpu import DimensionalityEstimator


@pytest.fixture(scope="module")
def data():
    # planar (intrinsically 2-d) data embedded in 3-d
    key = jax.random.PRNGKey(0)
    x2 = jax.random.normal(key, (80, 2))
    return jnp.concatenate([x2, jnp.zeros((80, 1))], axis=1)


@pytest.fixture(scope="module")
def fitted(data):
    est = DimensionalityEstimator()
    est.fit(data)
    return est


def test_shapes(data, fitted):
    assert fitted.local_dim_x.shape == (80,)
    assert fitted.log_density_x.shape == (80,)
    assert fitted.pre_transformation.shape[0] == 2


def test_local_dim_recovers_intrinsic_dimension(fitted):
    dims = np.asarray(fitted.local_dim_x)
    assert 1.0 < dims.mean() < 3.0


def test_predictors(data, fitted):
    dim_pred = fitted.predict(data)
    assert dim_pred.shape == (80,)
    assert np.all(np.asarray(dim_pred) > 0)  # ExpPredictor output is positive
    log_dim = fitted.predict(data, logscale=True)
    np.testing.assert_allclose(
        np.exp(np.asarray(log_dim)), np.asarray(dim_pred), atol=1e-8
    )
    dens_pred = fitted.predict_density(data)
    assert dens_pred.shape == (80,)
    # predictors should track the training values
    corr = np.corrcoef(np.asarray(dim_pred), np.asarray(fitted.local_dim_x))[0, 1]
    assert corr > 0.9


def test_fit_predict(data):
    est = DimensionalityEstimator()
    dims = est.fit_predict(data)
    assert dims.shape == (80,)
    assert np.all(np.isfinite(np.asarray(dims)))


def test_custom_k(data):
    est = DimensionalityEstimator(k=5)
    est.fit(data)
    assert est.distances.shape == (80, 5)
