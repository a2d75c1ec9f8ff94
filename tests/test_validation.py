"""Validator tests (reference analog: ``tests/test_validation.py``).

Covers the scalar/array/time validators, the nn-distance repair kernel, and
the cross-parameter compatibility checks in
``mellon_tpu/utils/parameter_validation.py``.
"""

import logging

import jax.numpy as jnp
import numpy as np
import pytest

from mellon_tpu.ops.kernels import Matern52
from mellon_tpu.utils.parameter_validation import (
    validate_cov_func,
    validate_cov_func_curry,
    validate_gp_type,
    validate_landmark_params,
    validate_normalize_parameter,
    validate_params,
    validate_rank_params,
)
from mellon_tpu.utils.util import GaussianProcessType
from mellon_tpu.utils.validation import (
    validate_1d,
    validate_array,
    validate_bool,
    validate_float,
    validate_float_or_int,
    validate_float_or_iterable_numerical,
    validate_k,
    validate_nn_distances,
    validate_positive_float,
    validate_positive_int,
    validate_string,
    validate_time_x,
)


# ---------------------------------------------------------------------------
# array / time validators
# ---------------------------------------------------------------------------


def test_validate_array_accepts_iterables_and_optional():
    out = validate_array([[1, 2], [3, 4]], "x")
    assert out.shape == (2, 2) and jnp.issubdtype(out.dtype, jnp.floating)
    assert validate_array(None, "x", optional=True) is None
    with pytest.raises(TypeError, match="can't be None"):
        validate_array(None, "x")
    with pytest.raises(TypeError, match="iterable or sparse"):
        validate_array(3.5, "x")


def test_validate_array_ndim_constraint():
    with pytest.raises(ValueError, match="dimensional array"):
        validate_array(jnp.ones(4), "x", ndim=2)
    out = validate_array(jnp.ones((4, 1)), "x", ndim=(1, 2))
    assert out.ndim == 2


def test_validate_time_x_concatenates_column():
    x = jnp.ones((5, 2))
    t = jnp.arange(5.0)
    out = validate_time_x(x, t)
    assert out.shape == (5, 3)
    assert np.allclose(np.asarray(out[:, -1]), np.arange(5.0))
    # 2-d column form
    out2 = validate_time_x(x, t.reshape(-1, 1))
    assert np.allclose(np.asarray(out), np.asarray(out2))


def test_validate_time_x_errors():
    x = jnp.ones((5, 2))
    with pytest.raises(ValueError, match="same number of samples"):
        validate_time_x(x, jnp.arange(4.0))
    with pytest.raises(ValueError, match="1 column"):
        validate_time_x(x, jnp.ones((5, 2)))
    # n_features checks: missing times vs plain mismatch
    with pytest.raises(ValueError, match="'times' is not provided"):
        validate_time_x(x, None, n_features=3)
    with pytest.raises(ValueError, match="Wrong number of features"):
        validate_time_x(x, jnp.arange(5.0), n_features=5)


def test_validate_time_x_cast_scalar():
    x = jnp.ones((4, 2))
    out = validate_time_x(x, 2.5, cast_scalar=True)
    assert out.shape == (4, 3)
    assert np.allclose(np.asarray(out[:, -1]), 2.5)


# ---------------------------------------------------------------------------
# scalar validators
# ---------------------------------------------------------------------------


def test_scalar_validators_happy_paths():
    assert validate_float_or_int(3, "p") == 3
    assert validate_float_or_int(np.float64(2.5), "p") == 2.5
    assert validate_float_or_int(None, "p", optional=True) is None
    assert validate_positive_float(1.5, "p") == 1.5
    assert validate_positive_float(np.asarray(2.0), "p") == 2.0
    assert validate_float(jnp.asarray([3.0]), "p") == 3.0
    assert validate_positive_int(7, "p") == 7
    assert validate_positive_int(None, "p", optional=True) is None
    assert validate_bool(True, "p") is True
    assert validate_string("abc", "p") == "abc"
    assert validate_string("a", "p", choices={"a", "b"}) == "a"


def test_scalar_validators_error_paths():
    with pytest.raises(ValueError):
        validate_positive_float(-1.0, "p")
    with pytest.raises(ValueError):
        validate_positive_float(float("nan"), "p")
    with pytest.raises(ValueError):
        validate_positive_float("text", "p")
    with pytest.raises(ValueError):
        validate_float_or_int(float("nan"), "p")
    with pytest.raises(ValueError):
        validate_float_or_int("text", "p")
    with pytest.raises(ValueError):
        validate_positive_int(-3, "p")
    with pytest.raises(ValueError):
        validate_positive_int(True, "p")
    with pytest.raises(ValueError):
        validate_positive_int(2.5, "p")
    with pytest.raises(TypeError):
        validate_bool(1, "p")
    with pytest.raises(TypeError):
        validate_bool(None, "p")
    with pytest.raises(TypeError):
        validate_string(3, "p")
    with pytest.raises(ValueError, match="one of"):
        validate_string("c", "p", choices={"a", "b"})
    with pytest.raises(ValueError, match="required to be a float"):
        validate_float(None, "p")


def test_validate_float_or_iterable():
    assert validate_float_or_iterable_numerical(2, "s") == 2.0
    arr = validate_float_or_iterable_numerical([1, 2, 3], "s")
    assert arr.shape == (3,)
    assert validate_float_or_iterable_numerical(None, "s", optional=True) is None
    with pytest.raises(ValueError, match="non-negative"):
        validate_float_or_iterable_numerical(-1.0, "s", positive=True)
    with pytest.raises(ValueError, match="non-negative"):
        validate_float_or_iterable_numerical([1.0, -2.0], "s", positive=True)
    with pytest.raises(TypeError):
        validate_float_or_iterable_numerical(True, "s")
    with pytest.raises(TypeError):
        validate_float_or_iterable_numerical("text", "s")


def test_validate_1d():
    assert validate_1d(3.0).shape == (1,)
    assert validate_1d([1.0, 2.0]).shape == (2,)
    with pytest.raises(ValueError, match="1-dimensional"):
        validate_1d(jnp.ones((2, 2)))


# ---------------------------------------------------------------------------
# nn-distance repair and k
# ---------------------------------------------------------------------------


@pytest.fixture
def propagate_logs():
    """The package logger has propagate=False (own stdout handler); caplog
    needs propagation on to observe records."""
    logger = logging.getLogger("mellon_tpu")
    logger.propagate = True
    yield
    logger.propagate = False


def test_validate_nn_distances_repairs_invalid(caplog, propagate_logs):
    nn = jnp.asarray([0.5, jnp.nan, jnp.inf, -1.0, 0.0, 0.25])
    with caplog.at_level(logging.WARNING, logger="mellon_tpu"):
        repaired = validate_nn_distances(nn)
    # all invalid entries become the minimum positive value (0.25)
    assert np.allclose(np.asarray(repaired), [0.5, 0.25, 0.25, 0.25, 0.25, 0.25])
    msg = " ".join(r.message for r in caplog.records)
    assert "1 NaN" in msg and "1 infinite" in msg
    assert validate_nn_distances(None, optional=True) is None
    with pytest.raises(ValueError, match="required"):
        validate_nn_distances(None)
    with pytest.raises(ValueError, match="invalid values"):
        validate_nn_distances(jnp.asarray([jnp.nan, -1.0]))


def test_validate_k():
    assert validate_k(5, 10) is None or True  # returns None; must not raise
    with pytest.raises(ValueError, match="integer"):
        validate_k(2.5, 10)
    with pytest.raises(ValueError, match="integer"):
        validate_k(True, 10)
    with pytest.raises(ValueError, match="at least 1"):
        validate_k(0, 10)
    with pytest.raises(ValueError, match="smaller than the number of samples"):
        validate_k(10, 10)


# ---------------------------------------------------------------------------
# cross-parameter compatibility (parameter_validation)
# ---------------------------------------------------------------------------


def test_validate_landmark_params():
    validate_landmark_params(3, jnp.ones((3, 2)))
    with pytest.raises(ValueError, match="n_landmarks"):
        validate_landmark_params(5, jnp.ones((3, 2)))


def test_validate_rank_params():
    # reduced rank with a Nystroem type: fine
    validate_rank_params(GaussianProcessType.FULL_NYSTROEM, 100, 50, 0)
    validate_rank_params(GaussianProcessType.SPARSE_NYSTROEM, 100, 10, 20)
    # full rank indicated (float >= 1.0 or rank == 0) with non-Nystroem: fine
    validate_rank_params(GaussianProcessType.FULL, 100, 1.0, 0)
    validate_rank_params(GaussianProcessType.SPARSE_CHOLESKY, 100, 0, 50)
    with pytest.raises(ValueError, match="rank"):
        # fractional rank indicates Nystroem but type is FULL
        validate_rank_params(GaussianProcessType.FULL, 100, 0.99, 0)
    with pytest.raises(ValueError):
        # full rank indicated for a Nystroem type
        validate_rank_params(GaussianProcessType.FULL_NYSTROEM, 100, 200, 0)
    with pytest.raises(ValueError):
        validate_rank_params(GaussianProcessType.SPARSE_NYSTROEM, 100, 50, 20)


def test_validate_gp_type_consistency():
    validate_gp_type(GaussianProcessType.FULL, 100, 0)
    validate_gp_type(GaussianProcessType.FULL, 100, 100)
    validate_gp_type(GaussianProcessType.SPARSE_CHOLESKY, 100, 50)
    with pytest.raises(ValueError):
        # full type but landmarks strictly between 0 and n
        validate_gp_type(GaussianProcessType.FULL, 100, 50)
    with pytest.raises(ValueError):
        # sparse type without landmarks
        validate_gp_type(GaussianProcessType.SPARSE_CHOLESKY, 100, 0)


def test_validate_params_dispatch():
    validate_params(1.0, GaussianProcessType.FULL, 100, 0, None)
    validate_params(0.99, GaussianProcessType.SPARSE_NYSTROEM, 100, 50, None)
    with pytest.raises(ValueError):
        validate_params(1.0, "not_a_type", 100, 0, None)
    with pytest.raises(ValueError):
        # fractional rank with a non-Nystroem type
        validate_params(0.99, GaussianProcessType.FULL, 100, 0, None)


def test_validate_cov_func_and_curry():
    curry = validate_cov_func_curry(Matern52, None, "cov_func_curry")
    assert curry is Matern52
    cov = validate_cov_func(Matern52(1.0), "cov_func")
    assert isinstance(cov, Matern52)
    assert validate_cov_func(None, "cov_func", optional=True) is None
    with pytest.raises(ValueError):
        validate_cov_func_curry(None, None, "cov_func_curry")
    with pytest.raises(ValueError):
        validate_cov_func("not_a_cov", "cov_func")


def test_validate_normalize_parameter():
    times = jnp.asarray([0.0, 1.0, 2.0])
    validate_normalize_parameter(True, times)
    validate_normalize_parameter([10.0, 20.0, 30.0], times)
    validate_normalize_parameter({0.0: 10, 1.0: 20, 2.0: 30}, times)
    with pytest.raises(ValueError):
        # wrong length list
        validate_normalize_parameter([10.0, 20.0], times)


def test_validators_accept_jax_scalar_types():
    """JAX scalar types must be accepted and converted to Python scalars
    (parity: reference ``tests/test_validation.py:429-501``)."""
    assert validate_float_or_iterable_numerical(jnp.float32(1.5), "p") == 1.5
    assert isinstance(
        validate_float_or_iterable_numerical(jnp.int32(3), "p"), float
    )
    r = validate_positive_float(jnp.float32(1.5), "p")
    assert isinstance(r, float) and r == 1.5
    r = validate_positive_float(jnp.int32(3), "p")
    assert isinstance(r, float) and r == 3.0
    r = validate_positive_int(jnp.int32(3), "p")
    assert isinstance(r, int) and r == 3
    # .item() extracted scalars behave like plain Python scalars
    assert validate_positive_int(jnp.array([3]).item(), "p") == 3
    assert (
        validate_float_or_iterable_numerical(jnp.array([2.5]).item(), "p")
        == 2.5
    )
