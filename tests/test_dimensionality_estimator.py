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


def test_string_representation(fitted):
    assert len(str(fitted)) > 0
    assert len(fitted._repr_html_()) > 0


def test_density_predictor_derivatives(data, fitted):
    """Gradient/hessian/slogdet shapes on the density predictor
    (parity: reference ``test_dimensionality_estimator.py:30-60``)."""
    n, d = data.shape
    grad = fitted.predict_density.gradient(data)
    assert grad.shape == (n, d)
    hess = fitted.predict_density.hessian(data)
    assert hess.shape == (n, d, d)
    sng, ld = fitted.predict_density.hessian_log_determinant(data)
    assert sng.shape == (n,)
    assert ld.shape == (n,)


@pytest.mark.parametrize(
    "rank, n_landmarks, compress",
    [
        (1.0, 0, None),
        (1.0, 10, "gzip"),
        (0.99, 60, None),
    ],
)
def test_serialization_with_uncertainty(
    data, tmp_path, rank, n_landmarks, compress
):
    """ADVI fit with uncertainty; predictor JSON roundtrip preserves both
    the prediction and the uncertainty (parity: reference
    ``test_dimensionality_estimator.py:62-112``)."""
    import mellon_tpu

    n = data.shape[0]
    # to_json appends the compression extension if missing (reference
    # parity: ``mellon/base_predictor.py:624-632``) while from_json opens
    # the literal path, so name the file with the extension up front.
    suffix = {"gzip": ".json.gz", "bz2": ".json.bz2", None: ".json"}[compress]
    test_file = str(tmp_path / f"predictor{suffix}")
    est = DimensionalityEstimator(
        rank=rank,
        n_landmarks=n_landmarks,
        optimizer="advi",
        predictor_with_uncertainty=True,
    )
    est.fit(data)
    dim_appr = est.predict(data)
    log_dim = est.predict(data, logscale=True)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(log_dim)), np.asarray(dim_appr), rtol=1e-6
    )
    assert est.predict.covariance(data).shape == (n,)
    assert est.predict.mean_covariance(data).shape == (n,)
    uncertainty = est.predict.uncertainty(data)
    assert uncertainty.shape == (n,)

    est.predict.to_json(test_file, compress=compress)
    predictor = mellon_tpu.Predictor.from_json(test_file, compress=compress)
    np.testing.assert_allclose(
        np.asarray(predictor(data)), np.asarray(dim_appr), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(predictor.uncertainty(data)),
        np.asarray(uncertainty),
        rtol=1e-6,
    )


def test_optimizer_adam_close_to_default(data, fitted):
    adam_est = DimensionalityEstimator(optimizer="adam")
    adam_dim = adam_est.fit_predict(data)
    ref = np.asarray(fitted.local_dim_x)
    rel = np.std(np.asarray(adam_dim) - ref) / np.std(ref)
    assert rel < 2.0


@pytest.mark.parametrize(
    "rank, n_landmarks, err_limit",
    [
        (1.0, 80, 1.0),
        (1.0, 10, 2.0),
        (0.99, 60, 1.0),
        (50, 60, 1.0),
    ],
)
def test_approximations_close_to_default(
    data, fitted, rank, n_landmarks, err_limit
):
    est = DimensionalityEstimator(rank=rank, n_landmarks=n_landmarks)
    est.fit(data)
    dim_appr = est.predict(data)
    ref = np.asarray(fitted.local_dim_x)
    rel = np.std(np.asarray(dim_appr) - ref) / np.std(ref)
    assert rel < err_limit


def test_error_paths_and_staged_protocol(data):
    """Error semantics + the prepare/run/process staged protocol
    (parity: reference ``test_dimensionality_estimator.py:147-170``)."""
    wide = jnp.concatenate([data] * 18, axis=1)  # d=54 > 50 limit
    est = DimensionalityEstimator()

    with pytest.raises(ValueError):
        est.fit_predict()
    with pytest.raises(ValueError):
        est.fit(None)
    est.set_x(data)
    with pytest.raises(ValueError):
        est.prepare_inference(wide)
    loss_func, initial_value = est.prepare_inference(None)
    est.run_inference(loss_func, initial_value, "advi")
    est.process_inference(est.pre_transformation)
    with pytest.raises(ValueError):
        est.fit_predict(wide)
    assert est.fit_predict().shape == (data.shape[0],)


def test_nuts_optimizer_on_stacked_latents(data):
    """optimizer='nuts' must sample the (2, k) stacked dimensionality
    latents through the flattening wrapper instead of misreading them as
    2 chains of 1-D latents (review fix)."""
    est = DimensionalityEstimator(optimizer="nuts", n_iter=8, n_landmarks=10)
    est.fit(data)
    assert est.pre_transformation.shape[0] == 2
    assert est.posterior_samples.ndim == 4  # (draws, chains, 2, k)
    ld = np.asarray(est.local_dim_x)
    assert np.all(np.isfinite(ld)) and np.all(ld > 0)
