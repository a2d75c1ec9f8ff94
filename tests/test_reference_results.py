"""Golden regression tests: hard-coded expected values protecting against
numerical drift, mirroring the reference's ``tests/test_reference_results.py``
strategy (values generated from this implementation on CPU/f64 after
verifying the math against the reference's formulas)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mellon_tpu import DensityEstimator, FunctionEstimator

PRED_FULL = np.array(
    [0.1076661157, 0.7640156343, -0.2759481331, -0.0370153392,
     0.0705136569, 0.4039735114, 0.0337871331, -0.1895564337]
)
LEV_FULL = np.array(
    [0.0672547248, 0.6198246307, 0.1343899837, 0.3723277177,
     0.0729505028, 0.12748604, 0.0846880657, 0.1370538093]
)
PRED_SPARSE = np.array(
    [0.1087242157, 0.7632655439, -0.2771296648, -0.0255654803,
     0.0700521023, 0.4045615625, 0.0366047035, -0.190724046]
)
LOG_DENSITY = np.array(
    [2.3717912699, 1.4877774729, 1.6437139895, 0.9382547766,
     2.3553186224, 2.2475542877, 2.2987954986, 1.2638890324]
)
EXPECTED_LS = 3.0782207348745523
EXPECTED_MU = -10.37839289802333


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(535)
    L = jax.random.uniform(jax.random.split(key)[0], (2, 2))
    cov_mat = L @ L.T + jnp.eye(2) * 0.1
    x = jax.random.multivariate_normal(
        jax.random.split(key)[1], jnp.zeros(2), cov_mat, (50,)
    )
    y = jnp.sin(x[:, 0]) * jnp.cos(x[:, 1])
    return x, y


def test_function_estimator_full_golden(data):
    x, y = data
    est = FunctionEstimator(sigma=0.1, gp_type="full")
    pred = est.fit_predict(x, y)
    np.testing.assert_allclose(np.asarray(pred[:8]), PRED_FULL, atol=1e-5)
    lev = est.leverage()
    np.testing.assert_allclose(np.asarray(lev[:8]), LEV_FULL, atol=1e-5)
    assert est.ls == pytest.approx(EXPECTED_LS, rel=1e-9)


def test_function_estimator_sparse_golden(data):
    x, y = data
    est = FunctionEstimator(sigma=0.1, n_landmarks=15)
    pred = est.fit_predict(x, y)
    np.testing.assert_allclose(np.asarray(pred[:8]), PRED_SPARSE, atol=1e-5)


def test_density_estimator_golden(data):
    x, _ = data
    est = DensityEstimator()
    ld = est.fit_predict(x)
    # L-BFGS path: tolerance reflects optimizer termination, not linalg drift
    np.testing.assert_allclose(np.asarray(ld[:8]), LOG_DENSITY, atol=1e-3)
    assert est.mu == pytest.approx(EXPECTED_MU, rel=1e-9)
