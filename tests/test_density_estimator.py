"""End-to-end DensityEstimator tests, mirroring the reference's
``tests/test_density_estimator.py`` strategy (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mellon_tpu
from mellon_tpu import DensityEstimator, Predictor


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(0)
    return jax.random.normal(key, (100, 3))


@pytest.fixture(scope="module")
def fitted(data):
    est = DensityEstimator()
    est.fit(data)
    return est


def test_fit_predict_consistency(data, fitted):
    """Predictor at training points matches the optimized latent function."""
    ld = np.asarray(fitted.log_density_x)
    pred = np.asarray(fitted.predict(data))
    rel_err = np.max(np.abs(ld - pred)) / np.std(ld)
    assert rel_err < 1e-4


def test_density_values_reasonable(data, fitted):
    from mellon_tpu.utils.util import mle
    from mellon_tpu.ops.neighbors import nn_distances

    # MAP log density should correlate strongly with the pointwise MLE
    target = np.asarray(mle(nn_distances(data), 3))
    got = np.asarray(fitted.log_density_x)
    corr = np.corrcoef(target, got)[0, 1]
    assert corr > 0.7


def test_gradient_hessian_shapes(data, fitted):
    x = data[:7]
    g = fitted.predict.gradient(x)
    assert g.shape == x.shape
    h = fitted.predict.hessian(x)
    assert h.shape == x.shape + x.shape[1:]
    sign, logdet = fitted.predict.hessian_log_determinant(x)
    assert sign.shape == (7,)
    assert logdet.shape == (7,)


def test_serialization_roundtrip(tmp_path, data, fitted):
    pred = fitted.predict
    expected = np.asarray(pred(data))

    # dict roundtrip
    restored = Predictor.from_dict(pred.to_dict())
    np.testing.assert_allclose(np.asarray(restored(data)), expected, atol=1e-10)

    # json / gzip / bz2 file roundtrips
    for compress, suffix in [(None, ".json"), ("gzip", ".json.gz"), ("bz2", ".json.bz2")]:
        path = str(tmp_path / f"predictor{suffix}")
        pred.to_json(path, compress=compress)
        restored = Predictor.from_json(path)
        np.testing.assert_allclose(np.asarray(restored(data)), expected, atol=1e-10)


def test_predictor_copy(data, fitted):
    cp = fitted.predict.copy()
    np.testing.assert_allclose(
        np.asarray(cp(data)), np.asarray(fitted.predict(data)), atol=1e-12
    )


def test_normalization(data, fitted):
    normalized = fitted.predict(data, normalize=True)
    plain = fitted.predict(data)
    np.testing.assert_allclose(
        np.asarray(plain) - np.log(100), np.asarray(normalized), atol=1e-12
    )


def test_sparse_approximation_close_to_full(data):
    full = DensityEstimator(gp_type="full")
    ld_full = full.fit_predict(data)
    sparse = DensityEstimator(n_landmarks=50)
    ld_sparse = sparse.fit_predict(data)
    corr = np.corrcoef(np.asarray(ld_full), np.asarray(ld_sparse))[0, 1]
    assert corr > 0.95


def test_nystroem_close_to_full(data):
    full = DensityEstimator(gp_type="full")
    ld_full = full.fit_predict(data)
    nys = DensityEstimator(rank=0.999, gp_type="full_nystroem")
    ld_nys = nys.fit_predict(data)
    corr = np.corrcoef(np.asarray(ld_full), np.asarray(ld_nys))[0, 1]
    assert corr > 0.95


def test_adam_optimizer(data):
    est = DensityEstimator(optimizer="adam", n_iter=50)
    ld = est.fit_predict(data)
    assert np.all(np.isfinite(np.asarray(ld)))


def test_advi_optimizer_with_uncertainty(data):
    est = DensityEstimator(
        optimizer="advi", n_iter=50, predictor_with_uncertainty=True
    )
    est.fit(data)
    assert est.pre_transformation_std is not None
    var = est.predict.mean_covariance(data[:5])
    assert var.shape == (5,)
    assert np.all(np.asarray(var) >= 0)
    total = est.predict.uncertainty(data[:5])
    assert np.all(np.asarray(total) >= np.asarray(var) - 1e-12)


def test_laplace_uncertainty(data):
    est = DensityEstimator(predictor_with_uncertainty=True)
    est.fit(data)
    assert est.pre_transformation_std is not None
    assert np.all(np.asarray(est.pre_transformation_std) > 0)
    var = est.predict.mean_covariance(data[:5])
    assert np.all(np.asarray(var) >= 0)


def test_reuse_precomputed_attributes(data, fitted):
    """Warm resume by attribute injection
    (parity: ``mellon/density_estimator.py:37-41``)."""
    est = DensityEstimator(
        nn_distances=fitted.nn_distances,
        ls=fitted.ls,
        landmarks=fitted.landmarks,
        L=fitted.L,
        Lp=fitted.Lp,
        mu=fitted.mu,
        initial_value=fitted.initial_value,
    )
    ld = est.fit_predict(data)
    np.testing.assert_allclose(
        np.asarray(ld), np.asarray(fitted.log_density_x), atol=1e-3
    )


def test_fixed_gp_type_with_explicit_landmarks(data):
    """gp_type='fixed' conditions on the provided landmarks as-is
    (parity: ``mellon/util.py:589-667`` FIXED semantics)."""
    import jax

    lm = jax.random.normal(jax.random.PRNGKey(5), (40, data.shape[1]))
    est = DensityEstimator(gp_type="fixed", landmarks=lm)
    ld = est.fit_predict(data)
    assert est.n_landmarks == 40
    assert np.isfinite(np.asarray(ld)).all()
    np.testing.assert_array_equal(np.asarray(est.landmarks), np.asarray(lm))


def test_error_paths(data):
    est = DensityEstimator()
    with pytest.raises(ValueError):
        est.fit_predict(None)  # no x at all
    est = DensityEstimator()
    est.fit(data)
    other = jax.random.normal(jax.random.PRNGKey(9), (50, 3))
    with pytest.raises(ValueError):
        est.fit_predict(other)  # conflicting x
    with pytest.raises(ValueError):
        est.predict(jnp.ones((5, 7)))  # wrong feature count
    with pytest.raises(ValueError):
        DensityEstimator(optimizer="gradient-descent")
    with pytest.raises(ValueError):
        DensityEstimator(d_method="bogus")


def test_d_over_50_raises():
    x = jax.random.normal(jax.random.PRNGKey(1), (60, 51))
    est = DensityEstimator()
    with pytest.raises(ValueError, match="dimensionality"):
        est.fit(x)


def test_string_representations(fitted):
    assert "DensityEstimator" in repr(fitted)
    assert "Predictor" in repr(fitted.predict) or "Conditional" in repr(
        fitted.predict
    )
    assert fitted._repr_html_()


def test_predictor_derivative_program_reused_across_calls(data, fitted):
    """gradient/hessian on the same predictor must reuse one compiled
    program across calls (a per-call jit-of-closure formulation recompiled
    and reloaded on every invocation)."""
    from mellon_tpu.inference.derivatives import _gradient_impl

    pred = fitted.predict
    x = jnp.asarray(np.random.RandomState(0).randn(7, data.shape[1]))
    _ = pred.gradient(x)
    size_after_first = _gradient_impl._cache_size()
    _ = pred.gradient(x)
    assert _gradient_impl._cache_size() == size_after_first


def test_single_dimension_input(data):
    """1-d state vectors are accepted and consistent between sparse and
    full GPs (parity: reference ``test_density_estimator.py:257-270``)."""
    n = data.shape[0]
    est = DensityEstimator()
    d1 = est.fit_predict(data[:, 0])
    assert d1.shape == (n,)
    est_full = DensityEstimator(rank=1.0, n_landmarks=0)
    d1_full = est_full.fit_predict(data[:, 0])
    assert float(jnp.std(d1 - d1_full)) < 1e-2


class TestLaplaceOnFits:
    """Laplace uncertainty wiring on real density fits (parity:
    reference ``tests/test_laplace.py:87-208``)."""

    def test_lbfgsb_and_adam_set_std(self, data):
        for opt, kwargs in [("L-BFGS-B", {}), ("adam", {"n_iter": 50})]:
            est = DensityEstimator(
                optimizer=opt,
                n_landmarks=20,
                predictor_with_uncertainty=True,
                **kwargs,
            )
            est.fit(data)
            assert est.pre_transformation_std is not None
            assert np.all(np.asarray(est.pre_transformation_std) > 0)

    def test_no_uncertainty_no_laplace(self, data):
        est = DensityEstimator(
            optimizer="L-BFGS-B",
            n_landmarks=20,
            predictor_with_uncertainty=False,
        )
        est.fit(data)
        assert est.pre_transformation_std is None

    def test_uncertainty_is_sum_of_components(self, data):
        est = DensityEstimator(
            optimizer="L-BFGS-B",
            n_landmarks=20,
            predictor_with_uncertainty=True,
        )
        est.fit(data)
        xt = data[:10]
        unc = est.predict.uncertainty(xt)
        cov = est.predict.covariance(xt)
        mean_cov = est.predict.mean_covariance(xt)
        assert np.all(np.asarray(mean_cov) >= 0)
        np.testing.assert_allclose(
            np.asarray(unc), np.asarray(cov + mean_cov), atol=1e-6
        )

    def test_laplace_vs_advi_mean_agreement(self, data):
        est_map = DensityEstimator(
            optimizer="L-BFGS-B",
            n_landmarks=20,
            predictor_with_uncertainty=True,
        )
        est_map.fit(data)
        est_advi = DensityEstimator(
            optimizer="advi",
            n_landmarks=20,
            n_iter=200,
            predictor_with_uncertainty=True,
        )
        est_advi.fit(data)
        xt = data[:20]
        corr = np.corrcoef(
            np.asarray(est_map.predict(xt)), np.asarray(est_advi.predict(xt))
        )[0, 1]
        assert corr > 0.8, f"MAP/ADVI mean predictions poorly correlated: {corr:.3f}"

    def test_full_gp_laplace(self, data):
        est = DensityEstimator(
            optimizer="L-BFGS-B",
            n_landmarks=0,
            predictor_with_uncertainty=True,
        )
        est.fit(data[:50])
        assert est.pre_transformation_std is not None
        unc = np.asarray(est.predict.uncertainty(data[:5]))
        assert np.all(np.isfinite(unc))
        assert np.all(unc >= 0)


def test_bf16_precision_map_close_to_default(data, fitted):
    """precision="bf16" runs the two-phase (bf16 coarse + f32 polish) MAP
    and stays close to the f32 fit; unknown options raise."""
    est = DensityEstimator(n_landmarks=50, precision="bf16")
    dens = est.fit_predict(data)
    ref = DensityEstimator(n_landmarks=50).fit_predict(data)
    corr = np.corrcoef(np.asarray(dens), np.asarray(ref))[0, 1]
    assert corr > 0.999, f"bf16 MAP diverged from f32: corr={corr:.5f}"
    rel = float(jnp.std(dens - ref) / jnp.std(ref))
    assert rel < 0.05, rel

    with pytest.raises(ValueError, match="precision"):
        DensityEstimator(precision="fp8")


def test_manual_d_method_without_d_raises(data):
    """d_method='manual' with d=None must raise a clear error, not a
    TypeError from `None > 50` (review fix)."""
    est = mellon_tpu.DensityEstimator(d_method="manual")
    with pytest.raises(ValueError, match="manual"):
        est.fit(data)
