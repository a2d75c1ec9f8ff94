"""Predictor factory dispatch: choose the conditional family from the model
configuration.

Behavioural parity target: ``mellon/inference.py:375-765``.
"""

import logging

import jax.numpy as jnp

from ..utils.util import DEFAULT_JITTER, ensure_2d
from .conditionals import (
    ExpFullConditional,
    ExpLandmarksConditional,
    ExpLandmarksConditionalCholesky,
    FullConditional,
    FullConditionalTime,
    LandmarksConditional,
    LandmarksConditionalCholesky,
    LandmarksConditionalCholeskyTime,
    LandmarksConditionalTime,
)
from .losses import compute_parameter_cov_factor

logger = logging.getLogger("mellon_tpu")


def _check_sigma_std_conflict(pre_transformation_std, sigma):
    if (
        pre_transformation_std is not None
        and sigma is not None
        and bool(jnp.any(jnp.asarray(sigma) > 0))
    ):
        raise ValueError(
            "One can specify either `sigma` or `pre_transformation_std` "
            "to describe uncertainty, but not both."
        )


def compute_conditional(
    x,
    landmarks,
    pre_transformation,
    pre_transformation_std,
    y,
    mu,
    cov_func,
    L,
    Lp=None,
    sigma=0,
    jitter=DEFAULT_JITTER,
    y_is_mean=False,
    with_uncertainty=False,
    obs_variance=False,
):
    """Build the conditional-mean predictor
    (parity: ``mellon/inference.py:375-508``)."""
    if landmarks is None:
        logger.debug("Using FullConditional GP.")
        if with_uncertainty and pre_transformation_std is not None:
            y_cov_factor = compute_parameter_cov_factor(pre_transformation_std, L)
        else:
            y_cov_factor = None
        return FullConditional(
            x,
            y,
            mu,
            cov_func,
            Lp,
            sigma=sigma,
            jitter=jitter,
            y_cov_factor=y_cov_factor,
            y_is_mean=y_is_mean,
            with_uncertainty=with_uncertainty,
            obs_variance=obs_variance,
        )
    elif (
        pre_transformation is not None
        and pre_transformation.shape[0] == landmarks.shape[0]
    ):
        logger.debug("Using LandmarksConditionalCholesky GP.")
        landmarks = ensure_2d(landmarks)
        _check_sigma_std_conflict(pre_transformation_std, sigma)
        if pre_transformation_std is not None:
            sigma = pre_transformation_std
        n_obs = x.shape[0]
        return LandmarksConditionalCholesky(
            landmarks,
            pre_transformation,
            mu,
            cov_func,
            n_obs,
            Lp,
            sigma=sigma,
            jitter=jitter,
            y_is_mean=y_is_mean,
            with_uncertainty=with_uncertainty,
            obs_variance=obs_variance,
            obs_x=x if obs_variance else None,
            obs_y=y if obs_variance else None,
        )
    else:
        logger.debug("Using LandmarksConditional GP.")
        landmarks = ensure_2d(landmarks)
        if with_uncertainty and pre_transformation_std is not None:
            y_cov_factor = compute_parameter_cov_factor(pre_transformation_std, L)
        else:
            y_cov_factor = None
        return LandmarksConditional(
            x,
            landmarks,
            y,
            mu,
            cov_func,
            L,
            # forward the landmark Cholesky so the conditional skips its own
            # k(xu,xu) + m³ factorization; the reference drops Lp here and
            # passes only the dead L parameter (``mellon/inference.py:495``)
            Lp=Lp,
            sigma=sigma,
            jitter=jitter,
            y_cov_factor=y_cov_factor,
            y_is_mean=y_is_mean,
            with_uncertainty=with_uncertainty,
            obs_variance=obs_variance,
        )


def compute_conditional_times(
    x,
    landmarks,
    pre_transformation,
    pre_transformation_std,
    y,
    mu,
    cov_func,
    L,
    Lp,
    sigma=0,
    jitter=DEFAULT_JITTER,
    y_is_mean=False,
    with_uncertainty=False,
):
    """Time-aware predictor variant (parity: ``mellon/inference.py:511-636``)."""
    if landmarks is None:
        logger.debug("Using FullConditional GP.")
        if pre_transformation_std is not None:
            y_cov_factor = compute_parameter_cov_factor(pre_transformation_std, L)
        else:
            y_cov_factor = None
        return FullConditionalTime(
            x,
            y,
            mu,
            cov_func,
            Lp,
            sigma=sigma,
            jitter=jitter,
            y_cov_factor=y_cov_factor,
            y_is_mean=y_is_mean,
            with_uncertainty=with_uncertainty,
        )
    elif (
        pre_transformation is not None
        and pre_transformation.shape[0] == landmarks.shape[0]
    ):
        logger.debug("Using LandmarksConditionalCholesky GP.")
        landmarks = ensure_2d(landmarks)
        _check_sigma_std_conflict(pre_transformation_std, sigma)
        if pre_transformation_std is not None:
            sigma = pre_transformation_std
        n_obs = x.shape[0]
        return LandmarksConditionalCholeskyTime(
            landmarks,
            pre_transformation,
            mu,
            cov_func,
            n_obs,
            Lp,
            sigma=sigma,
            jitter=jitter,
            y_is_mean=y_is_mean,
            with_uncertainty=with_uncertainty,
        )
    else:
        logger.debug("Using LandmarksConditional GP.")
        landmarks = ensure_2d(landmarks)
        if pre_transformation_std is not None:
            y_cov_factor = compute_parameter_cov_factor(pre_transformation_std, L)
        else:
            y_cov_factor = None
        return LandmarksConditionalTime(
            x,
            landmarks,
            y,
            mu,
            cov_func,
            Lp=Lp,
            sigma=sigma,
            jitter=jitter,
            y_cov_factor=y_cov_factor,
            y_is_mean=y_is_mean,
            with_uncertainty=with_uncertainty,
        )


def compute_conditional_explog(
    x,
    landmarks,
    pre_transformation,
    pre_transformation_std,
    y,
    mu,
    cov_func,
    L,
    Lp,
    sigma=0,
    jitter=DEFAULT_JITTER,
    y_is_mean=False,
    with_uncertainty=False,
):
    """Exp-mean predictor for the dimensionality GP
    (parity: ``mellon/inference.py:639-765``)."""
    if landmarks is None:
        logger.debug("Using FullConditional GP.")
        if with_uncertainty and pre_transformation_std is not None:
            y_cov_factor = compute_parameter_cov_factor(pre_transformation_std, L)
        else:
            y_cov_factor = None
        y = jnp.log(y)
        return ExpFullConditional(
            x,
            y,
            mu,
            cov_func,
            Lp,
            sigma=sigma,
            jitter=jitter,
            y_cov_factor=y_cov_factor,
            y_is_mean=y_is_mean,
            with_uncertainty=with_uncertainty,
        )
    elif (
        pre_transformation is not None
        and pre_transformation.shape[0] == landmarks.shape[0]
    ):
        logger.debug("Using LandmarksConditionalCholesky GP.")
        landmarks = ensure_2d(landmarks)
        _check_sigma_std_conflict(pre_transformation_std, sigma)
        if pre_transformation_std is not None:
            sigma = pre_transformation_std
        n_obs = x.shape[0]
        return ExpLandmarksConditionalCholesky(
            landmarks,
            pre_transformation,
            mu,
            cov_func,
            n_obs,
            Lp,
            sigma=sigma,
            jitter=jitter,
            y_is_mean=y_is_mean,
            with_uncertainty=with_uncertainty,
        )
    else:
        logger.debug("Using LandmarksConditional GP.")
        landmarks = ensure_2d(landmarks)
        if with_uncertainty and pre_transformation_std is not None:
            y_cov_factor = compute_parameter_cov_factor(pre_transformation_std, L)
        else:
            y_cov_factor = None
        y = jnp.log(y)
        return ExpLandmarksConditional(
            x,
            landmarks,
            y,
            mu,
            cov_func,
            Lp=Lp,
            sigma=sigma,
            jitter=jitter,
            y_cov_factor=y_cov_factor,
            y_is_mean=y_is_mean,
            with_uncertainty=with_uncertainty,
        )
