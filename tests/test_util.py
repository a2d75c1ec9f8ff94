"""Foundation-utility tests (reference analog: ``tests/test_util.py``,
extended to the helpers the reference tests elsewhere or not at all:
batched_vmap, multi-time decorator, rank diagnostic, typed serialization,
active-dims scatter/gather, repr helpers).
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mellon_tpu.utils.util import (
    GaussianProcessType,
    add_diagonal,
    add_variance,
    batched_vmap,
    deserialize,
    distance,
    distance_grad,
    ensure_2d,
    expand_to_inactive,
    make_multi_time_argument,
    make_serializable,
    mle,
    object_html,
    object_str,
    select_active_dims,
    set_verbosity,
    stabilize,
)
from mellon_tpu.utils.util import test_rank as rank_check


@pytest.fixture
def x():
    return jnp.asarray(np.random.RandomState(0).randn(20, 3))


@pytest.fixture
def propagate_logs():
    """The package logger has propagate=False (own stdout handler); caplog
    needs propagation on to observe records."""
    logger = logging.getLogger("mellon_tpu")
    logger.propagate = True
    yield
    logger.propagate = False


def test_distance_symmetry_and_zero_diag(x):
    D = distance(x, x)
    assert np.allclose(np.asarray(D), np.asarray(D.T), atol=1e-8)
    # the 1e-12 epsilon keeps the self-distance tiny but nonzero
    assert float(jnp.max(jnp.diagonal(D))) < 1e-5


def test_distance_grad_matches_autodiff(x):
    y = jnp.asarray(np.random.RandomState(1).randn(7, 3))
    dist, grad = distance_grad(x)(y)
    assert dist.shape == (20, 7) and grad.shape == (20, 7, 3)

    def one(yj, xi):
        return jnp.sqrt(jnp.sum((xi - yj) ** 2) + 1e-12)

    g_ad = jax.grad(one)(y[2], x[5])
    assert np.allclose(np.asarray(grad[5, 2]), np.asarray(g_ad), atol=1e-6)
    assert np.isclose(float(dist[5, 2]), float(one(y[2], x[5])), atol=1e-8)


def test_batched_vmap_matches_vmap(x):
    w = jnp.arange(3.0)

    def f(row, w):
        return jnp.atleast_1d(jnp.dot(row, w))

    full = jax.vmap(f, in_axes=(0, None))(x, w)
    for bs in (1, 3, 7, 100):
        batched = batched_vmap(f, x, w, batch_size=bs)
        assert np.allclose(np.asarray(batched), np.asarray(full))


def test_stabilize_and_add_diagonal():
    A = jnp.zeros((4, 4))
    assert np.allclose(np.asarray(stabilize(A, 1e-3)), 1e-3 * np.eye(4))
    B = add_diagonal(jnp.ones((3, 3)), 2.0)
    assert np.allclose(np.diagonal(np.asarray(B)), 3.0)


def test_add_variance_forms():
    K = jnp.eye(3)
    # no M: plain jitter
    assert np.allclose(np.asarray(add_variance(K, jitter=1e-2)), np.eye(3) * 1.01)
    # scalar M: sigma^2 floor at jitter
    out = add_variance(K, M=2.0, jitter=1e-6)
    assert np.allclose(np.diagonal(np.asarray(out)), 5.0)
    tiny = add_variance(K, M=1e-9, jitter=1e-2)
    assert np.allclose(np.diagonal(np.asarray(tiny)), 1.01)
    # matrix M: K + M M^T with per-entry diagonal floor
    M = jnp.asarray([[1.0], [0.0], [0.0]])
    out = add_variance(K, M=M, jitter=1e-2)
    expected = np.eye(3) + np.asarray(M) @ np.asarray(M).T
    expected[1, 1] += 1e-2
    expected[2, 2] += 1e-2
    assert np.allclose(np.asarray(out), expected)


def test_mle_monotone_decreasing_in_distance():
    d = 4
    r = jnp.asarray([0.1, 0.5, 2.0])
    vals = mle(r, d)
    assert float(vals[0]) > float(vals[1]) > float(vals[2])
    # closed form check against the d-sphere volume expression
    from jax.scipy.special import gammaln

    expected = gammaln(d / 2 + 1) - (d / 2) * np.log(np.pi) - d * np.log(0.5)
    assert np.isclose(float(vals[1]), float(expected), atol=1e-10)


def test_ensure_2d():
    v = jnp.arange(5.0)
    out = ensure_2d(v)
    assert out.shape == (5, 1)
    m = jnp.ones((4, 2))
    assert ensure_2d(m).shape == (4, 2)


def test_select_and_expand_active_dims(x):
    sel = select_active_dims(x, [0, 2])
    assert sel.shape == (20, 2)
    assert np.allclose(np.asarray(sel), np.asarray(x)[:, [0, 2]])
    scalar_sel = select_active_dims(x, 1)
    assert scalar_sel.shape == (20, 1)
    assert select_active_dims(x, None) is x
    sl = select_active_dims(x, slice(0, 2))
    assert sl.shape == (20, 2)

    vals = jnp.ones((20, 2))
    full = expand_to_inactive(vals, (20, 3), [0, 2])
    assert full.shape == (20, 3)
    assert np.allclose(np.asarray(full)[:, 1], 0.0)
    assert np.allclose(np.asarray(full)[:, [0, 2]], 1.0)
    assert expand_to_inactive(vals, (20, 2), None) is vals


def test_make_multi_time_argument_vmaps_over_grid():
    class Model:
        @make_multi_time_argument
        def score(self, x, time=None):
            return x * 10.0 + time

    m = Model()
    x = jnp.arange(3.0)
    out = m.score(x, multi_time=jnp.asarray([0.0, 1.0, 2.0, 3.0]))
    # out_axes=1: (n, n_times)
    assert out.shape == (3, 4)
    assert np.allclose(np.asarray(out[:, 2]), np.asarray(x * 10.0 + 2.0))
    # single-time pass-through
    single = m.score(x, time=5.0)
    assert np.allclose(np.asarray(single), np.asarray(x * 10.0 + 5.0))
    with pytest.raises(ValueError, match="both 'time' and 'multi_time'"):
        m.score(x, time=1.0, multi_time=jnp.asarray([0.0]))
    assert "multi_time" in str(Model.score.__signature__)


def test_rank_diagnostic_matrix_and_estimator(caplog, propagate_logs):
    L = jnp.asarray(np.diag([1.0, 1.0, 1e-8]))
    assert rank_check(L) == 2
    assert rank_check(jnp.eye(5)) == 5

    class Holder:
        pass

    h = Holder()
    h.L = jnp.eye(3)
    with caplog.at_level(logging.INFO, logger="mellon_tpu"):
        assert rank_check(h, threshold=0.5) == 3
    assert any("rank fraction" in r.message.lower() for r in caplog.records)

    h.L = None
    with pytest.raises(AttributeError, match="prepare_inference"):
        rank_check(h)
    with pytest.raises(TypeError):
        rank_check(42)
    with pytest.raises(ValueError, match="2D"):
        rank_check(jnp.ones(4))


def test_serialization_roundtrip_typed_values():
    cases = [
        jnp.asarray([1.0, 2.0, 3.0]),
        slice(1, 10, 2),
        slice(None, -1, None),
        {"a": jnp.ones(2), "b": {"c": slice(0, 1)}},
        {1.5, 2.5},
        3,
        2.25,
        True,
        None,
        "text",
    ]
    for value in cases:
        encoded = make_serializable(value)
        import json

        decoded = deserialize(json.loads(json.dumps(encoded)))
        if hasattr(value, "dtype"):
            assert np.allclose(np.asarray(decoded), np.asarray(value))
        elif isinstance(value, dict):
            assert set(decoded) == set(value)
            assert np.allclose(np.asarray(decoded["a"]), np.asarray(value["a"]))
            assert decoded["b"]["c"] == value["b"]["c"]
        else:
            assert decoded == value or (value is None and decoded is None)


def test_serializable_array_tag_matches_reference_format():
    encoded = make_serializable(jnp.arange(3.0))
    assert encoded["type"] == "jax.numpy"
    assert encoded["data"] == [0.0, 1.0, 2.0]
    # 0-d arrays collapse to plain scalars
    assert make_serializable(jnp.asarray(4.0)) == 4.0


def test_gp_type_fuzzy_parsing(caplog, propagate_logs):
    assert GaussianProcessType.from_string("full") is GaussianProcessType.FULL
    assert (
        GaussianProcessType.from_string("Sparse Cholesky")
        is GaussianProcessType.SPARSE_CHOLESKY
    )
    with caplog.at_level(logging.WARNING, logger="mellon_tpu"):
        assert (
            GaussianProcessType.from_string("nystroem")
            is GaussianProcessType.FULL_NYSTROEM
        )
    assert any("Partial match" in r.message for r in caplog.records)
    assert GaussianProcessType.from_string(None, optional=True) is None
    with pytest.raises(ValueError):
        GaussianProcessType.from_string(None)
    with pytest.raises(ValueError, match="Unknown"):
        GaussianProcessType.from_string("bogus_type")


def test_object_str_and_html():
    arr = jnp.ones((100, 3))
    s = object_str(arr, ["cells", "dims"])
    assert "100 cells" in s and "3 dims" in s and "dtype" in s
    h = object_html(arr, ["cells"])
    assert h.startswith("<span>") and "100 cells" in h
    # html escaping of plain objects
    assert "&lt;" in object_html("<tag>")
    assert object_str("plain") == "plain"


def test_legacy_namespace_module_imports():
    """The reference exposes mellon.util/cov/... as real modules
    (``mellon/_util.py`` etc.); our aliases must support the same
    ``from mellon_tpu.util import ...`` import form, not just attributes."""
    import importlib

    for name, attr in (
        ("mellon_tpu.util", "distance"),
        ("mellon_tpu.cov", "Matern52"),
        ("mellon_tpu.model", "DensityEstimator"),
        ("mellon_tpu.conditional", "FullConditional"),
        ("mellon_tpu.derivatives", "gradient"),
        ("mellon_tpu.validation", "validate_array"),
        ("mellon_tpu.parameters", "compute_ls"),
        ("mellon_tpu.inference", "compute_conditional"),
    ):
        mod = importlib.import_module(name)
        assert hasattr(mod, attr), f"{name}.{attr} missing"


def test_set_verbosity_toggles_level():
    logger = logging.getLogger("mellon_tpu")
    original = logger.level
    try:
        set_verbosity(False)
        assert logger.level == logging.WARNING
        set_verbosity(True)
        assert logger.level == logging.INFO
    finally:
        logger.setLevel(original)


def test_distance_gradient_finite_at_coincident_points_f32():
    """Autodiff through ``distance`` must stay finite when query points
    coincide with training points in f32: cancellation in the matmul form
    can leave the squared distance <= 0 despite the epsilon, and
    sqrt(max(sq, 0)) then backpropagates 0 * inf = NaN (observed as NaN
    predictor gradients at training points on a FULL-GP density fit)."""
    # large-magnitude coordinates maximize f32 cancellation
    pts = jnp.asarray(
        np.random.RandomState(0).randn(50, 10) * 4, dtype=jnp.float32
    )

    def total_dist(y):
        return jnp.sum(distance(pts, y))

    g = jax.grad(total_dist)(pts)  # y == x: all diagonal distances ~ 0
    assert bool(jnp.all(jnp.isfinite(g)))
