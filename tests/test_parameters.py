"""Parameter heuristics and validation-table tests, mirroring the reference's
``tests/test_parameters.py`` and ``tests/test_validation.py`` strategies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mellon_tpu.ops import Matern52
from mellon_tpu.parameters import (
    compute_L,
    compute_Lp,
    compute_average_cell_count,
    compute_cov_func,
    compute_d,
    compute_d_factal,
    compute_distances,
    compute_gp_type,
    compute_initial_value,
    compute_landmarks,
    compute_landmarks_rescale_time,
    compute_ls,
    compute_mu,
    compute_n_landmarks,
    compute_nn_distances,
    compute_nn_distances_within_time_points,
    compute_rank,
)
from mellon_tpu.utils.util import GaussianProcessType
from mellon_tpu.utils.parameter_validation import validate_params
from mellon_tpu.utils.validation import (
    validate_nn_distances,
    validate_positive_float,
    validate_time_x,
)


@pytest.fixture(scope="module")
def data():
    return jax.random.normal(jax.random.PRNGKey(0), (100, 3))


# --- gp_type decision table (contract: mellon/parameters.py:175-240) -------

@pytest.mark.parametrize(
    "n_landmarks,rank,n_samples,expected",
    [
        (100, 1.0, 100, GaussianProcessType.FULL),
        (0, None, 100, GaussianProcessType.FULL),
        (100, 0.5, 100, GaussianProcessType.FULL_NYSTROEM),
        (100, 50, 100, GaussianProcessType.FULL_NYSTROEM),
        (50, 1.0, 100, GaussianProcessType.SPARSE_CHOLESKY),
        (50, None, 100, GaussianProcessType.SPARSE_CHOLESKY),
        (50, 0.5, 100, GaussianProcessType.SPARSE_NYSTROEM),
        (50, 20, 100, GaussianProcessType.SPARSE_NYSTROEM),
    ],
)
def test_compute_gp_type(n_landmarks, rank, n_samples, expected):
    assert compute_gp_type(n_landmarks, rank, n_samples) == expected


def test_compute_rank():
    assert compute_rank(None) == 1.0
    assert compute_rank(GaussianProcessType.FULL) == 1.0
    assert compute_rank(GaussianProcessType.FULL_NYSTROEM) == 0.99
    assert compute_rank(GaussianProcessType.SPARSE_NYSTROEM) == 0.99


def test_compute_n_landmarks():
    assert compute_n_landmarks(None, 100, None) == 100
    assert compute_n_landmarks(None, 10000, None) == 5000
    assert compute_n_landmarks(GaussianProcessType.FULL, 10000, None) == 10000
    assert (
        compute_n_landmarks(GaussianProcessType.SPARSE_CHOLESKY, 10000, None) == 5000
    )
    landmarks = jnp.ones((77, 3))
    assert compute_n_landmarks(None, 100, landmarks) == 77


def test_validate_params_errors():
    with pytest.raises(ValueError):
        validate_params(1.0, "not_a_type", 100, 50, None)
    with pytest.raises(ValueError):
        # FULL with fewer landmarks than samples
        validate_params(1.0, GaussianProcessType.FULL, 100, 50, None)
    with pytest.raises(ValueError):
        # SPARSE with n_landmarks=0
        validate_params(1.0, GaussianProcessType.SPARSE_CHOLESKY, 100, 0, None)
    with pytest.raises(ValueError):
        # rank indicates Nystroem but type is not
        validate_params(0.5, GaussianProcessType.SPARSE_CHOLESKY, 100, 50, None)
    with pytest.raises(ValueError):
        # full-rank rank with Nystroem type
        validate_params(1.0, GaussianProcessType.SPARSE_NYSTROEM, 100, 50, None)
    with pytest.raises(ValueError):
        # landmark count mismatch
        validate_params(1.0, GaussianProcessType.SPARSE_CHOLESKY, 100, 50, jnp.ones((30, 3)))


# --- landmarks --------------------------------------------------------------

def test_compute_landmarks(data):
    landmarks = compute_landmarks(data, n_landmarks=20)
    assert landmarks.shape == (20, 3)
    # deterministic under the same seed
    landmarks2 = compute_landmarks(data, n_landmarks=20)
    np.testing.assert_allclose(np.asarray(landmarks), np.asarray(landmarks2))
    assert compute_landmarks(data, n_landmarks=0) is None
    assert compute_landmarks(data, n_landmarks=200) is None
    got = compute_landmarks(
        data, gp_type=GaussianProcessType.FIXED, n_landmarks=200
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(data))


def test_compute_landmarks_rescale_time(data):
    times = jnp.linspace(0, 1, 100)
    landmarks = compute_landmarks_rescale_time(
        data, 1.0, 0.5, times=times, n_landmarks=20
    )
    assert landmarks.shape == (20, 4)
    # time column stays within the original time range
    assert float(landmarks[:, -1].min()) >= -0.1
    assert float(landmarks[:, -1].max()) <= 1.1


# --- distances --------------------------------------------------------------

def test_compute_nn_distances(data):
    nn = compute_nn_distances(data)
    assert nn.shape == (100,)
    assert np.all(np.asarray(nn) > 0)


def test_compute_distances_k_validation(data):
    with pytest.raises(ValueError):
        compute_distances(data, 0)
    with pytest.raises(ValueError):
        compute_distances(data, 100)
    with pytest.raises(ValueError):
        compute_distances(data, 1.5)


def test_nn_distances_within_time_points():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (30, 2))
    times = jnp.repeat(jnp.asarray([0.0, 1.0, 2.0]), 10)
    xt = validate_time_x(x, times)
    nn = compute_nn_distances_within_time_points(xt)
    assert nn.shape == (30,)
    # within-time distances >= global distances
    nn_global = compute_nn_distances(x)
    assert np.all(np.asarray(nn) >= np.asarray(nn_global) - 1e-12)

    # normalization changes distances
    nn_norm = compute_nn_distances_within_time_points(xt, d=2, normalize=True)
    assert nn_norm.shape == (30,)

    # per-time-point dict normalization
    nn_dict = compute_nn_distances_within_time_points(
        xt, d=2, normalize={0.0: 10, 1.0: 20, 2.0: 10}
    )
    assert nn_dict.shape == (30,)
    with pytest.raises(ValueError, match="lacks entries for time point"):
        compute_nn_distances_within_time_points(xt, d=2, normalize={0.0: 10})


# --- scalar heuristics ------------------------------------------------------

def test_compute_d(data):
    assert compute_d(data) == 3
    assert compute_d(jnp.zeros(10)) == 1


def test_compute_d_factal():
    key = jax.random.PRNGKey(2)
    x2 = jax.random.normal(key, (300, 2))
    x = jnp.concatenate([x2, jnp.zeros((300, 2))], axis=1)
    d = compute_d_factal(x)
    assert 1.0 < d < 3.5


def test_compute_mu_and_ls(data):
    nn = compute_nn_distances(data)
    mu = compute_mu(nn, 3)
    assert isinstance(mu, float)
    ls = compute_ls(nn)
    assert ls > 0
    # geometric-mean scaling: doubling distances doubles ls
    ls2 = compute_ls(2 * nn)
    assert ls2 == pytest.approx(2 * ls, rel=1e-6)


def test_compute_cov_func():
    cov = compute_cov_func(Matern52, 2.0)
    assert isinstance(cov, Matern52)
    assert cov.ls == 2.0
    cov_t = compute_cov_func(Matern52, 2.0, ls_time=0.5)
    rep = repr(cov_t)
    assert "*" in rep


# --- L / Lp -----------------------------------------------------------------

def test_compute_L_shapes(data):
    cov = Matern52(ls=2.0)
    landmarks = compute_landmarks(data, n_landmarks=20)

    L_full = compute_L(data, cov, gp_type="full")
    assert L_full.shape == (100, 100)

    L_sparse = compute_L(data, cov, gp_type="sparse_cholesky", landmarks=landmarks)
    assert L_sparse.shape == (100, 20)

    L_nys = compute_L(
        data, cov, gp_type="sparse_nystroem", landmarks=landmarks, rank=0.99
    )
    assert L_nys.shape[0] == 100
    assert L_nys.shape[1] <= 20

    Lp = compute_Lp(data, cov, gp_type="sparse_cholesky", landmarks=landmarks)
    assert Lp.shape == (20, 20)
    assert compute_Lp(data, cov, gp_type="sparse_nystroem", landmarks=landmarks) is None

    # wrong Lp shape raises
    with pytest.raises(ValueError, match="Wrong shape"):
        compute_L(
            data,
            cov,
            gp_type="sparse_cholesky",
            landmarks=landmarks,
            Lp=jnp.eye(5),
        )


def test_compute_initial_value(data):
    cov = Matern52(ls=2.0)
    nn = compute_nn_distances(data)
    L = compute_L(data, cov, gp_type="full")
    z0 = compute_initial_value(nn, 3, -2.0, L)
    assert z0.shape == (100,)
    assert np.all(np.isfinite(np.asarray(z0)))


def test_compute_average_cell_count():
    x = jnp.concatenate(
        [jnp.zeros((10, 2)), jnp.repeat(jnp.asarray([[0.0], [1.0]]), 5, axis=0)],
        axis=1,
    )
    assert compute_average_cell_count(x, None) == 5.0
    assert compute_average_cell_count(x, True) == 5.0
    assert compute_average_cell_count(x, {0.0: 4, 1.0: 6}) == 5.0
    assert compute_average_cell_count(x, [4, 6]) == 5.0
    with pytest.raises(ValueError):
        compute_average_cell_count(x, "bogus")


# --- validation helpers -----------------------------------------------------

def test_validate_nn_distances_repair():
    nn = jnp.asarray([1.0, jnp.nan, jnp.inf, -1.0, 0.5])
    fixed = validate_nn_distances(nn)
    np.testing.assert_allclose(np.asarray(fixed), [1.0, 0.5, 0.5, 0.5, 0.5])
    with pytest.raises(ValueError):
        validate_nn_distances(jnp.asarray([jnp.nan, -1.0]))
    assert validate_nn_distances(None, optional=True) is None


def test_validate_positive_float():
    assert validate_positive_float(1.5, "x") == 1.5
    assert validate_positive_float(None, "x", optional=True) is None
    with pytest.raises(ValueError):
        validate_positive_float(-1.0, "x")
    with pytest.raises(ValueError):
        validate_positive_float(float("nan"), "x")


def test_validate_time_x():
    x = jnp.zeros((5, 2))
    t = jnp.arange(5.0)
    xt = validate_time_x(x, t)
    assert xt.shape == (5, 3)
    with pytest.raises(ValueError):
        validate_time_x(x, jnp.arange(4.0))
    with pytest.raises(ValueError):
        validate_time_x(x, t, n_features=5)
    # scalar cast
    xt = validate_time_x(x, 2.0, n_features=3, cast_scalar=True)
    np.testing.assert_allclose(np.asarray(xt[:, -1]), 2.0)


def test_gaussian_process_type_fuzzy_parsing():
    assert GaussianProcessType.from_string("full") == GaussianProcessType.FULL
    assert (
        GaussianProcessType.from_string("sparse_cholesky")
        == GaussianProcessType.SPARSE_CHOLESKY
    )
    assert (
        GaussianProcessType.from_string("cholesky")
        == GaussianProcessType.SPARSE_CHOLESKY
    )
    assert GaussianProcessType.from_string(None, optional=True) is None
    with pytest.raises(ValueError):
        GaussianProcessType.from_string("bogus_type")
    with pytest.raises(ValueError):
        GaussianProcessType.from_string(None)


def test_within_time_single_search_equals_per_group_loop():
    """The offset-dimension single-search formulation must reproduce a
    per-group brute-force 1-NN exactly, including ragged group sizes."""
    from mellon_tpu.parameters import compute_nn_distances_within_time_points

    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (120, 3))
    # ragged groups: 7, 50, 63
    times = jnp.concatenate(
        [jnp.zeros(7), jnp.ones(50), jnp.full(63, 5.0)]
    )
    got = compute_nn_distances_within_time_points(x, times)
    for t in (0.0, 1.0, 5.0):
        mask = np.asarray(times) == t
        pts = np.asarray(x)[mask]
        full = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
        np.fill_diagonal(full, np.inf)
        np.testing.assert_allclose(
            np.asarray(got)[mask], full.min(axis=1), rtol=1e-6
        )
