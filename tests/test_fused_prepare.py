"""The fused one-program prepare must be invisible: identical attributes and
results to the lazy per-attribute path, applied only in the default sparse
configuration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mellon_tpu
import mellon_tpu.models.fused as fused


@pytest.fixture
def data():
    rs = np.random.RandomState(0)
    # two clusters so the density is interesting; n > n_landmarks forces the
    # sparse (fused-eligible) path
    x = np.concatenate(
        [rs.randn(150, 3) * 0.5 + 2.0, rs.randn(150, 3) * 0.8 - 2.0]
    )
    return jnp.asarray(x)


def _prepare(data, use_fused, **kwargs):
    old = fused.ENABLED
    fused.ENABLED = use_fused
    try:
        est = mellon_tpu.DensityEstimator(n_landmarks=50, **kwargs)
        est.prepare_inference(data)
    finally:
        fused.ENABLED = old
    return est


def test_fused_prepare_matches_lazy_bitwise(data):
    est_f = _prepare(data, True)
    est_l = _prepare(data, False)
    np.testing.assert_array_equal(
        np.asarray(est_f.nn_distances), np.asarray(est_l.nn_distances)
    )
    assert est_f.d == est_l.d
    assert est_f.mu == est_l.mu
    assert est_f.ls == est_l.ls
    assert repr(est_f.cov_func) == repr(est_l.cov_func)
    np.testing.assert_array_equal(
        np.asarray(est_f.landmarks), np.asarray(est_l.landmarks)
    )
    np.testing.assert_array_equal(np.asarray(est_f.Lp), np.asarray(est_l.Lp))
    np.testing.assert_array_equal(np.asarray(est_f.L), np.asarray(est_l.L))
    np.testing.assert_array_equal(
        np.asarray(est_f.initial_value), np.asarray(est_l.initial_value)
    )


def test_fused_fit_predict_matches_lazy(data):
    old = fused.ENABLED
    try:
        fused.ENABLED = True
        d1 = mellon_tpu.DensityEstimator(n_landmarks=50).fit_predict(data)
        fused.ENABLED = False
        d2 = mellon_tpu.DensityEstimator(n_landmarks=50).fit_predict(data)
    finally:
        fused.ENABLED = old
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-12)


def test_fused_applies_only_in_default_config(data):
    est = _prepare(data, True)
    # the sparse default config IS fused-eligible: verify by checking the
    # gate directly on a fresh estimator
    est2 = mellon_tpu.DensityEstimator(n_landmarks=50)
    est2.set_x(data)
    est2._prepare_attribute("n_landmarks")
    est2._prepare_attribute("rank")
    est2._prepare_attribute("gp_type")
    assert fused.maybe_fused_sparse_prepare(est2)

    # customizations must fall back to the lazy path
    declined = []
    for kwargs in (
        {"d_method": "fractal"},
        {"d": 3},
        {"ls": 2.0},
        {"mu": -3.0},
        {"nn_distances": jnp.full(data.shape[0], 0.1)},
    ):
        est3 = mellon_tpu.DensityEstimator(n_landmarks=50, **kwargs)
        est3.set_x(data)
        est3._prepare_attribute("n_landmarks")
        est3._prepare_attribute("rank")
        est3._prepare_attribute("gp_type")
        declined.append(not fused.maybe_fused_sparse_prepare(est3))
    assert all(declined)

    # full (non-sparse) GP declines too
    est4 = mellon_tpu.DensityEstimator()
    small = data[:40]
    est4.set_x(small)
    est4._prepare_attribute("n_landmarks")
    est4._prepare_attribute("rank")
    est4._prepare_attribute("gp_type")
    assert not fused.maybe_fused_sparse_prepare(est4)


def test_fused_prepare_with_custom_seed_and_ls_factor(data):
    est_f = _prepare(data, True, random_state=7, ls_factor=2.0)
    est_l = _prepare(data, False, random_state=7, ls_factor=2.0)
    np.testing.assert_array_equal(
        np.asarray(est_f.landmarks), np.asarray(est_l.landmarks)
    )
    assert np.isclose(est_f.ls, est_l.ls, rtol=1e-12)


def test_prune_factorize_program_matches_lazy_components(data):
    """The stage-2 pruning program must equal the lazy pipeline it fuses:
    submatrix Cholesky + cross-covariance TRSM + ridge warm start."""
    from jax.scipy.linalg import solve_triangular

    from mellon_tpu.models.fused import _fused_prune_factorize_program
    from mellon_tpu.ops.cluster import k_means
    from mellon_tpu.ops.linalg import ridge_solve, safe_cholesky
    from mellon_tpu.parameters import compute_nn_distances
    from mellon_tpu.utils.util import mle, stabilize
    from mellon_tpu.ops.kernels import Matern52

    x = data
    nn = compute_nn_distances(x)
    ls, mu, d, jitter = 3.0, -4.0, 3, 1e-6
    cov = Matern52(ls)
    xu = k_means(x, 40, random_state=0)
    K = cov(xu, xu)
    piv = jnp.asarray(np.random.RandomState(1).permutation(40)[:16], dtype=jnp.int32)

    Lp_f, xu_sel_f, L_f, z0_f, ok = _fused_prune_factorize_program(
        K, piv, x, xu, nn, mu, (ls,), jitter, ("matern52", None, 1), d
    )
    assert bool(ok)

    K_sub = K[piv][:, piv]
    Lp_l = safe_cholesky(K_sub, jitter=jitter, max_tries=3)
    xu_sel_l = xu[piv]
    C = cov(x, xu_sel_l)
    L_l = solve_triangular(Lp_l, C.T, lower=True).T
    z0_l = ridge_solve(L_l, mle(nn, d) - mu, 1.0)

    np.testing.assert_array_equal(np.asarray(Lp_f), np.asarray(Lp_l))
    np.testing.assert_array_equal(np.asarray(xu_sel_f), np.asarray(xu_sel_l))
    np.testing.assert_allclose(np.asarray(L_f), np.asarray(L_l), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(z0_f), np.asarray(z0_l), rtol=1e-10)


@pytest.fixture
def time_data():
    rs = np.random.RandomState(3)
    x = rs.randn(240, 3).astype(np.float64)
    times = rs.randint(0, 4, 240).astype(np.float64)
    return jnp.asarray(x), jnp.asarray(times)


def _prepare_time(time_data, use_fused, **kwargs):
    x, times = time_data
    old = fused.ENABLED
    fused.ENABLED = use_fused
    try:
        est = mellon_tpu.TimeSensitiveDensityEstimator(
            n_landmarks=40, ls_time=1.5, **kwargs
        )
        est.prepare_inference(x, times)
    finally:
        fused.ENABLED = old
    return est


@pytest.mark.parametrize("normalize", [False, True])
def test_fused_time_prepare_matches_lazy(time_data, normalize):
    est_f = _prepare_time(time_data, True, normalize_per_time_point=normalize)
    est_l = _prepare_time(time_data, False, normalize_per_time_point=normalize)
    np.testing.assert_allclose(
        np.asarray(est_f.nn_distances), np.asarray(est_l.nn_distances), rtol=1e-12
    )
    assert est_f.d == est_l.d
    assert np.isclose(est_f.mu, est_l.mu, rtol=1e-12)
    assert np.isclose(est_f.ls, est_l.ls, rtol=1e-12)
    assert repr(est_f.cov_func) == repr(est_l.cov_func)
    np.testing.assert_allclose(
        np.asarray(est_f.landmarks), np.asarray(est_l.landmarks), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(est_f.Lp), np.asarray(est_l.Lp), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(est_f.L), np.asarray(est_l.L), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(est_f.initial_value), np.asarray(est_l.initial_value), rtol=1e-8
    )


def test_fused_time_fit_predict_matches_lazy(time_data):
    x, times = time_data
    old = fused.ENABLED
    try:
        fused.ENABLED = True
        d1 = mellon_tpu.TimeSensitiveDensityEstimator(
            n_landmarks=40, ls_time=1.5
        ).fit_predict(x, times)
        fused.ENABLED = False
        d2 = mellon_tpu.TimeSensitiveDensityEstimator(
            n_landmarks=40, ls_time=1.5
        ).fit_predict(x, times)
    finally:
        fused.ENABLED = old
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-8)


def test_fused_time_declines_without_ls_time(time_data):
    x, times = time_data
    est = mellon_tpu.TimeSensitiveDensityEstimator(n_landmarks=40)
    from mellon_tpu.utils.validation import validate_time_x

    est.set_x(validate_time_x(x, times))
    est._prepare_attribute("n_landmarks")
    est._prepare_attribute("rank")
    est._prepare_attribute("gp_type")
    assert not fused.maybe_fused_time_prepare(est)


def test_optimistic_factorization_recovery(data):
    """If the fused prune path's unverified Cholesky were bad (simulated by
    corrupting Lp/L/initial_value with NaNs), _run_inference must rebuild
    from the stored fallback and still converge."""
    est = _prepare(data, True)
    K = est.cov_func(est.landmarks, est.landmarks)
    piv = np.arange(est.landmarks.shape[0])
    good = mellon_tpu.DensityEstimator(n_landmarks=50).fit_predict(data)

    # corrupt the factorization as if the optimistic Cholesky had failed
    est.Lp = est.Lp * jnp.nan
    est.L = est.L * jnp.nan
    est.initial_value = est.initial_value * jnp.nan
    est.transform = None
    est.loss_func = None
    est._prepare_attribute("transform")
    est._prepare_attribute("loss_func")
    est._fused_lp_fallback = (K, piv)
    est.run_inference()
    est.process_inference()
    assert est._fused_lp_fallback is None
    np.testing.assert_allclose(
        np.asarray(est.log_density_x), np.asarray(good), rtol=1e-6
    )


def test_optimistic_fallback_checked_for_other_optimizers(data):
    est = _prepare(data, True)
    K = est.cov_func(est.landmarks, est.landmarks)
    piv = np.arange(est.landmarks.shape[0])
    est.Lp = est.Lp * jnp.nan
    est.L = est.L * jnp.nan
    est.initial_value = est.initial_value * jnp.nan
    est.transform = None
    est.loss_func = None
    est._prepare_attribute("transform")
    est._prepare_attribute("loss_func")
    est._fused_lp_fallback = (K, piv)
    est.optimizer = "adam"
    est.n_iter = 30
    est.run_inference()
    assert est._fused_lp_fallback is None
    assert np.isfinite(np.asarray(est.pre_transformation)).all()


def test_fused_dimensionality_prepare_matches_lazy(data):
    def prep(use_fused):
        old = fused.ENABLED
        fused.ENABLED = use_fused
        try:
            est = mellon_tpu.DimensionalityEstimator(n_landmarks=50)
            est.prepare_inference(data)
        finally:
            fused.ENABLED = old
        return est

    est_f, est_l = prep(True), prep(False)
    np.testing.assert_allclose(
        np.asarray(est_f.distances), np.asarray(est_l.distances), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(est_f.d), np.asarray(est_l.d), rtol=1e-12)
    assert np.isclose(est_f.mu_dens, est_l.mu_dens, rtol=1e-12)
    assert np.isclose(est_f.ls, est_l.ls, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(est_f.landmarks), np.asarray(est_l.landmarks), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(est_f.Lp), np.asarray(est_l.Lp), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(est_f.L), np.asarray(est_l.L), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(est_f.initial_value),
        np.asarray(est_l.initial_value),
        rtol=1e-8,
    )


def test_fused_dimensionality_fit_matches_lazy(data):
    old = fused.ENABLED
    try:
        fused.ENABLED = True
        e1 = mellon_tpu.DimensionalityEstimator(n_landmarks=50).fit(data)
        fused.ENABLED = False
        e2 = mellon_tpu.DimensionalityEstimator(n_landmarks=50).fit(data)
    finally:
        fused.ENABLED = old
    np.testing.assert_allclose(
        np.asarray(e1.local_dim_x), np.asarray(e2.local_dim_x), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(e1.log_density_x), np.asarray(e2.log_density_x), rtol=1e-6
    )


def test_fused_function_prepare_matches_lazy(data):
    y = jnp.sin(data[:, 0]) + 0.1 * data[:, 1]

    def prep(use_fused):
        old = fused.ENABLED
        fused.ENABLED = use_fused
        try:
            est = mellon_tpu.FunctionEstimator(n_landmarks=50, sigma=0.1)
            est.fit(data, y)
        finally:
            fused.ENABLED = old
        return est

    est_f, est_l = prep(True), prep(False)
    np.testing.assert_array_equal(
        np.asarray(est_f.nn_distances), np.asarray(est_l.nn_distances)
    )
    assert est_f.ls == est_l.ls
    np.testing.assert_array_equal(
        np.asarray(est_f.landmarks), np.asarray(est_l.landmarks)
    )
    np.testing.assert_allclose(
        np.asarray(est_f.predict(data[:20])),
        np.asarray(est_l.predict(data[:20])),
        rtol=1e-12,
    )


def test_user_initial_value_is_not_clobbered(data):
    """A user-supplied initial_value must survive prepare_inference (the
    fused path declines; the lazy chain skips non-None attributes)."""
    z0 = jnp.zeros(50)
    est = mellon_tpu.DensityEstimator(n_landmarks=50, initial_value=z0)
    est.prepare_inference(data)
    assert est.initial_value is z0


def test_check_rank_true_runs_diagnostic_on_prune_path(data, caplog):
    """An explicit check_rank=True must run the rank diagnostic even when
    the f32 prune path sets the factorization (finding: the fused prune
    path previously set L directly, silently skipping test_rank)."""
    import logging

    from mellon_tpu.models.fused import _finish_factorization
    from mellon_tpu.ops.kernels import Matern52
    from mellon_tpu.models import fused as fused_mod

    est = mellon_tpu.DensityEstimator(n_landmarks=50, check_rank=True)
    est.set_x(data)
    est._prepare_attribute("n_landmarks")
    est._prepare_attribute("rank")
    est._prepare_attribute("gp_type")
    est._prepare_attribute("nn_distances")
    est._prepare_attribute("d")
    est._prepare_attribute("mu")
    est._prepare_attribute("ls")
    est._prepare_attribute("cov_func")
    est._prepare_attribute("landmarks")
    xu = est.landmarks
    K = est.cov_func(xu, xu)
    spec, _ = est.cov_func.operand_spec()
    params = (float(est.ls),)

    def run_ok(xu_, Lp_):
        return fused_mod._fused_factorize_program(
            data, xu_, Lp_, est.nn_distances, est.mu, params, spec, est.d
        )

    def run_prune(piv_):
        return fused_mod._fused_prune_factorize_program(
            K, piv_, data, xu, est.nn_distances, est.mu, params,
            float(est.jitter), spec, est.d,
        )

    # force the prune path (ok=False) with a synthetic low pivot count
    import numpy as np_

    _finish_factorization(
        est, data, xu, K, K * jnp.nan, False, False, run_ok, run_prune,
        pivot=(np_.arange(50), 40),
    )
    # L must be left to the lazy chain so _compute_L runs test_rank
    assert est.L is None
    assert est.Lp is not None
    assert est.check_rank is True
    logger = logging.getLogger("mellon_tpu")
    logger.propagate = True
    try:
        with caplog.at_level(logging.INFO, logger="mellon_tpu"):
            est._prepare_attribute("L")
    finally:
        logger.propagate = False
    assert any("rank" in r.message.lower() for r in caplog.records)


def test_optimistic_only_within_fit(data):
    """A bare prepare_inference must never leave unverified NaNs: the
    optimistic deferral applies only when fit() guarantees run_inference."""
    est = mellon_tpu.DensityEstimator(n_landmarks=50)
    est.prepare_inference(data)
    assert getattr(est, "_fused_lp_fallback", None) is None
    assert np.isfinite(np.asarray(est.initial_value)).all()


def test_fused_prepare_nn_repair_warning(data, caplog):
    import logging

    # duplicate rows -> zero nn distances -> repair warning must still fire
    x = jnp.concatenate([data, data[:5]], axis=0)
    logger = logging.getLogger("mellon_tpu")
    logger.propagate = True
    try:
        with caplog.at_level(logging.WARNING, logger="mellon_tpu"):
            est = _prepare(x, True)
    finally:
        logger.propagate = False
    assert any("invalid values" in r.message for r in caplog.records)
    assert bool(jnp.all(est.nn_distances > 0))


# ---------------------------------------------------------------------------
# sparse_nystroem fused prepare (m > 512 randomized path)
# ---------------------------------------------------------------------------


@pytest.fixture
def nystroem_data():
    rs = np.random.RandomState(1)
    x = np.concatenate(
        [rs.randn(500, 4) * 0.5 + 2.0, rs.randn(500, 4) * 0.8 - 2.0]
    )
    return jnp.asarray(x)


def _prepare_nystroem(data, use_fused, **kwargs):
    old = fused.ENABLED
    fused.ENABLED = use_fused
    try:
        est = mellon_tpu.DensityEstimator(
            gp_type="sparse_nystroem", n_landmarks=550, rank=0.999, **kwargs
        )
        est.prepare_inference(data)
    finally:
        fused.ENABLED = old
    return est


def test_fused_nystroem_prepare_matches_lazy(nystroem_data):
    est_f = _prepare_nystroem(nystroem_data, True)
    est_l = _prepare_nystroem(nystroem_data, False)
    np.testing.assert_array_equal(
        np.asarray(est_f.nn_distances), np.asarray(est_l.nn_distances)
    )
    assert est_f.d == est_l.d
    # mu/ls computed inside the big fused program differ from the lazy
    # per-attribute programs at the last f64 ulp (XLA fusion boundaries)
    assert est_f.mu == pytest.approx(est_l.mu, rel=1e-12)
    assert est_f.ls == pytest.approx(est_l.ls, rel=1e-12)
    np.testing.assert_allclose(
        np.asarray(est_f.landmarks), np.asarray(est_l.landmarks),
        rtol=1e-10, atol=0,
    )
    # same selected rank and factor; the fused core computes C inside one
    # program (the lazy path materializes it eagerly), so allow fusion-level
    # float differences while requiring agreement far below model noise
    assert est_f.L.shape == est_l.L.shape
    np.testing.assert_allclose(
        np.asarray(est_f.L), np.asarray(est_l.L), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(est_f.initial_value),
        np.asarray(est_l.initial_value),
        rtol=1e-5,
        atol=1e-8,
    )


def test_fused_nystroem_fit_predict_matches_lazy(nystroem_data):
    old = fused.ENABLED
    try:
        fused.ENABLED = True
        d1 = mellon_tpu.DensityEstimator(
            gp_type="sparse_nystroem", n_landmarks=550, rank=0.999
        ).fit_predict(nystroem_data)
        fused.ENABLED = False
        d2 = mellon_tpu.DensityEstimator(
            gp_type="sparse_nystroem", n_landmarks=550, rank=0.999
        ).fit_predict(nystroem_data)
    finally:
        fused.ENABLED = old
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4)


def test_fused_nystroem_declines_small_m_and_custom_config(nystroem_data):
    """m <= 512 keeps the exact-eigh lazy path; check_rank=True declines."""
    from mellon_tpu.models.fused import maybe_fused_nystroem_prepare

    est = mellon_tpu.DensityEstimator(
        gp_type="sparse_nystroem", n_landmarks=100, rank=0.999
    )
    est.x = est.set_x(nystroem_data)
    est._prepare_attribute("n_landmarks")
    est._prepare_attribute("rank")
    est._prepare_attribute("gp_type")
    assert maybe_fused_nystroem_prepare(est) is False

    est2 = mellon_tpu.DensityEstimator(
        gp_type="sparse_nystroem", n_landmarks=550, rank=0.999, check_rank=True
    )
    est2.x = est2.set_x(nystroem_data)
    est2._prepare_attribute("n_landmarks")
    est2._prepare_attribute("rank")
    est2._prepare_attribute("gp_type")
    assert maybe_fused_nystroem_prepare(est2) is False


def test_no_prune_config_keeps_all_landmarks(caplog):
    """config.PRUNE_SINGULAR_LANDMARKS=False keeps the full landmark set
    via a direct host-f64 factorization (no jitter escalation), on both
    the lazy hook (_lp_accept_or_prune) and the fused finisher
    (_finish_factorization).  Unit-level: the x64 test suite promotes
    kernels to f64, so a genuinely f32-singular end-to-end prepare cannot
    be staged here — the hooks are driven directly with a singular f32
    kernel and a failed Cholesky attempt."""
    import logging

    import mellon_tpu.config as config
    from mellon_tpu.models.fused import _finish_factorization

    m = 60
    rs = np.random.RandomState(2)
    xu = jnp.asarray(rs.randn(m, 3), jnp.float32)
    # near-all-ones kernel: f32-singular, f64-factorizable with jitter
    K = jnp.asarray(
        np.ones((m, m)) + 1e-5 * (rs.randn(m, 3) @ rs.randn(3, m)), jnp.float32
    )
    K = 0.5 * (K + K.T)
    L_failed = jnp.full((m, m), jnp.nan, dtype=jnp.float32)

    logger = logging.getLogger("mellon_tpu")
    old_flag = config.PRUNE_SINGULAR_LANDMARKS
    logger.propagate = True
    try:
        config.PRUNE_SINGULAR_LANDMARKS = False

        # lazy hook
        est = mellon_tpu.DensityEstimator(n_landmarks=m)
        est.landmarks = xu
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger="mellon_tpu"):
            Lp = est._lp_accept_or_prune(K, L_failed, False)
        assert any("pruning disabled" in r.message for r in caplog.records)
        assert Lp.shape == (m, m) and Lp.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(Lp)))
        assert est.landmarks.shape[0] == m  # NOT pruned

        # fused finisher
        est2 = mellon_tpu.DensityEstimator(n_landmarks=m)
        x = jnp.asarray(rs.randn(200, 3), jnp.float32)
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger="mellon_tpu"):
            _finish_factorization(
                est2, x, xu, K, L_failed, False, False,
                lambda *a: (_ for _ in ()).throw(AssertionError("run_ok")),
                lambda *a: (_ for _ in ()).throw(AssertionError("run_prune")),
                pivot=None,
            )
        assert any("pruning disabled" in r.message for r in caplog.records)
        assert est2.Lp.shape == (m, m)
        assert bool(jnp.all(jnp.isfinite(est2.Lp)))
        assert est2.L is None  # left to the lazy chain (chunked TRSM)
    finally:
        config.PRUNE_SINGULAR_LANDMARKS = old_flag
        logger.propagate = False
        logger.propagate = False


def test_chunked_trsm_matches_unchunked():
    """Row-chunked _standard_low_rank equals the single-program solve."""
    import mellon_tpu.ops.linalg as lin
    from mellon_tpu.ops.kernels import Matern52

    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(130, 3))
    xu = jnp.asarray(rs.randn(20, 3))
    cov = Matern52(2.0)
    L_ref = lin._standard_low_rank(x, cov, xu)
    old = (lin.TRSM_CHUNK_MIN_M, lin.TRSM_CHUNK_MIN_N, lin.TRSM_CHUNK_ROWS)
    try:
        lin.TRSM_CHUNK_MIN_M, lin.TRSM_CHUNK_MIN_N, lin.TRSM_CHUNK_ROWS = 8, 50, 48
        L_chunked = lin._standard_low_rank(x, cov, xu)
    finally:
        lin.TRSM_CHUNK_MIN_M, lin.TRSM_CHUNK_MIN_N, lin.TRSM_CHUNK_ROWS = old
    assert L_chunked.shape == L_ref.shape
    np.testing.assert_allclose(np.asarray(L_chunked), np.asarray(L_ref), rtol=1e-12)


def test_chunked_prune_factorize_matches_single_program(data):
    """The chunked multi-program stage-2 route (used when the single
    (n, pruned-m) TRSM program would OOM — see _chunked_prune_factorize)
    must agree with _fused_prune_factorize_program on the same inputs.
    Chunking is forced by lowering the linalg thresholds."""
    from mellon_tpu.models.fused import (
        _chunked_prune_factorize,
        _fused_prune_factorize_program,
    )
    from mellon_tpu.ops import linalg as linalg_mod
    from mellon_tpu.ops.cluster import k_means
    from mellon_tpu.parameters import compute_nn_distances
    from mellon_tpu.ops.kernels import Matern52

    x = data
    nn = compute_nn_distances(x)
    ls, mu, d, jitter = 3.0, -4.0, 3, 1e-6
    cov = Matern52(ls)
    xu = k_means(x, 40, random_state=0)
    K = cov(xu, xu)
    piv = jnp.asarray(
        np.random.RandomState(1).permutation(40)[:16], dtype=jnp.int32
    )
    spec, params = ("matern52", None, 1), (ls,)

    ref = _fused_prune_factorize_program(
        K, piv, x, xu, nn, mu, params, jitter, spec, d
    )

    class _Est:
        jitter = 1e-6

    old_m, old_n, old_rows = (
        linalg_mod.TRSM_CHUNK_MIN_M,
        linalg_mod.TRSM_CHUNK_MIN_N,
        linalg_mod.TRSM_CHUNK_ROWS,
    )
    linalg_mod.TRSM_CHUNK_MIN_M = 8
    linalg_mod.TRSM_CHUNK_MIN_N = 16
    linalg_mod.TRSM_CHUNK_ROWS = 37  # non-divisor: exercises the padding
    try:
        got = _chunked_prune_factorize(
            _Est(), K, piv, x, xu, nn, mu, params, spec, d
        )
    finally:
        linalg_mod.TRSM_CHUNK_MIN_M = old_m
        linalg_mod.TRSM_CHUNK_MIN_N = old_n
        linalg_mod.TRSM_CHUNK_ROWS = old_rows

    assert bool(got[4])
    for name, a, b, tol in (
        ("Lp", ref[0], got[0], 1e-6),
        ("xu_sel", ref[1], got[1], 0.0),
        ("L", ref[2], got[2], 1e-5),
        ("z0", ref[3], got[3], 1e-4),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=tol, atol=tol,
            err_msg=name,
        )
