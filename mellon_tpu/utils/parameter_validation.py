"""Cross-parameter compatibility checks.

Behavioural parity target: ``mellon/parameter_validation.py`` — the estimator
test-suite treats this decision/validation table as a contract.
"""

import logging

from .util import GaussianProcessType
from .validation import validate_positive_int, validate_float_or_int

logger = logging.getLogger("mellon_tpu")


def validate_landmark_params(n_landmarks, landmarks):
    """Parity: ``mellon/parameter_validation.py:13-31``."""
    if landmarks is not None and n_landmarks != landmarks.shape[0]:
        n_spec = landmarks.shape[0]
        message = (
            f"There are {n_spec:,} landmarks specified but "
            f"n_landmarks={n_landmarks:,}. "
            "Please omit specifying n_landmarks if landmarks are given."
        )
        logger.error(message)
        raise ValueError(message)


def validate_rank_params(gp_type, n_samples, rank, n_landmarks):
    """Parity: ``mellon/parameter_validation.py:34-93``."""
    full_rank_indicated = (
        type(rank) is int
        and (
            (gp_type == GaussianProcessType.SPARSE_CHOLESKY and rank >= n_landmarks)
            or (gp_type == GaussianProcessType.SPARSE_NYSTROEM and rank >= n_landmarks)
            or (gp_type == GaussianProcessType.FULL and rank >= n_samples)
            or (gp_type == GaussianProcessType.FULL_NYSTROEM and rank >= n_samples)
        )
        or type(rank) is float
        and rank >= 1.0
        or rank == 0
    )
    if full_rank_indicated:
        if gp_type == GaussianProcessType.FULL_NYSTROEM:
            message = (
                f"Gaussian Process type {gp_type} requires "
                "fractional 0 < rank < 1 or integer "
                f"0 < rank < {n_samples:,} (number of cells) "
                f"but the actual rank is {rank}."
            )
            logger.error(message)
            raise ValueError(message)
        elif gp_type == GaussianProcessType.SPARSE_NYSTROEM:
            message = (
                f"Gaussian Process type {gp_type} requires "
                "fractional 0 < rank < 1 or integer "
                f"0 < rank < {n_landmarks:,} (number of landmakrs) "
                f"but the actual rank is {rank}."
            )
            logger.error(message)
            raise ValueError(message)
    elif (
        gp_type != GaussianProcessType.FULL_NYSTROEM
        and gp_type != GaussianProcessType.SPARSE_NYSTROEM
    ):
        message = (
            f"Given rank {rank} indicates Nyström rank reduction. "
            f"But the Gaussian Process type is set to {gp_type}."
        )
        logger.error(message)
        raise ValueError(message)


def validate_gp_type(gp_type, n_samples, n_landmarks):
    """Parity: ``mellon/parameter_validation.py:96-146``."""
    if (
        (
            gp_type == GaussianProcessType.FULL
            or gp_type == GaussianProcessType.FULL_NYSTROEM
        )
        and n_landmarks != 0
        and n_landmarks < n_samples
    ):
        message = (
            f"Gaussian Process type {gp_type} but n_landmarks={n_landmarks:,} "
            f"is smaller than the number of cells {n_samples:,}. "
            "Omit n_landmarks or set it to 0 to use "
            "a non-sparse Gaussian Process or omit gp_type to use a sparse one."
        )
        logger.error(message)
        raise ValueError(message)
    elif (
        gp_type == GaussianProcessType.SPARSE_CHOLESKY
        or gp_type == GaussianProcessType.SPARSE_NYSTROEM
    ):
        if n_landmarks == 0:
            message = (
                f"Gaussian Process type {gp_type} but n_landmarks=0. "
                f"Set n_landmarks to a number smaller than the number of "
                f"cells {n_samples:,} to use a sparse Gaussian Process "
                "or omit gp_type to use a non-sparse one."
            )
            logger.error(message)
            raise ValueError(message)
        elif n_landmarks >= n_samples:
            message = (
                f"Gaussian Process type {gp_type} but n_landmarks="
                f"{n_landmarks:,} is larger or equal the number of cells "
                f"{n_samples:,}. Reduce the number of landmarks to use a "
                "sparse Gaussian Process or omit gp_type to use a non-sparse one."
            )
            logger.warning(message)
            raise ValueError(message)


def validate_params(rank, gp_type, n_samples, n_landmarks, landmarks):
    """Parity: ``mellon/parameter_validation.py:149-192``."""
    n_landmarks = validate_positive_int(n_landmarks, "n_landmarks")
    rank = validate_float_or_int(rank, "rank")

    if not isinstance(gp_type, GaussianProcessType):
        message = (
            "gp_type needs to be a mellon_tpu GaussianProcessType but is a "
            f"{type(gp_type)} instead."
        )
        logger.error(message)
        raise ValueError(message)

    validate_landmark_params(n_landmarks, landmarks)
    if n_landmarks > n_samples and gp_type != GaussianProcessType.FIXED:
        logger.warning(
            f"n_landmarks={n_landmarks:,} is larger than the number "
            f"of cells {n_samples:,}."
        )
    validate_gp_type(gp_type, n_samples, n_landmarks)
    validate_rank_params(gp_type, n_samples, rank, n_landmarks)


def validate_cov_func_curry(cov_func_curry, cov_func, param_name):
    """Parity: ``mellon/parameter_validation.py:195-229``."""
    from ..ops.kernels import Covariance

    if cov_func_curry is None and cov_func is None:
        raise ValueError(
            "At least one of 'cov_func_curry' and 'cov_func' must not be None"
        )
    if cov_func_curry is not None:
        if not isinstance(cov_func_curry, type) or not issubclass(
            cov_func_curry, Covariance
        ):
            raise ValueError(
                f"'{param_name}' must be a subclass of mellon_tpu.Covariance"
            )
    return cov_func_curry


def validate_cov_func(cov_func, param_name, optional=False):
    """Parity: ``mellon/parameter_validation.py:232-263``."""
    from ..ops.kernels import Covariance

    if cov_func is None and optional:
        return None
    if not isinstance(cov_func, Covariance):
        raise ValueError(
            f"'{param_name}' must be an instance of a subclass of "
            "mellon_tpu.Covariance"
        )
    return cov_func


def validate_normalize_parameter(normalize, unique_times):
    """Parity: ``mellon/parameter_validation.py:266-279``."""
    import jax.numpy as jnp

    if isinstance(normalize, dict):
        missing_times = [t for t in unique_times if t.item() not in normalize]
        if missing_times:
            raise ValueError(
                f"Missing time point(s) in normalization dictionary: {missing_times}"
            )
    elif isinstance(normalize, (list, jnp.ndarray)) and len(normalize) != len(
        unique_times
    ):
        raise ValueError(
            "Length of the normalize list or array must match the number "
            "of unique time points."
        )
