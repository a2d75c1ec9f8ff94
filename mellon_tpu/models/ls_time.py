"""Automatic time length-scale selection.

Behavioural parity target: ``mellon/compute_ls_time.py``: fit one density
model per unique time point, correlate the per-time density fields, and fit
the time-kernel length scale to match the correlations (the L-BFGS fit runs
on device via :func:`mellon_tpu.inference.optimizers.minimize_lbfgsb`).
"""

import logging

import jax.numpy as jnp

from ..inference.optimizers import minimize_lbfgsb
from ..utils.validation import validate_time_x

logger = logging.getLogger("mellon_tpu")


def compute_ls_time(
    nn_distances,
    x,
    cov_func_curry,
    times=None,
    warn_below=500,
    return_data=False,
    density_estimator_kwargs=dict(),
):
    """Estimate ls_time from cross-time density correlations
    (parity: ``mellon/compute_ls_time.py:12-104``)."""
    from .density import DensityEstimator

    x = validate_time_x(x, times)
    times = x[:, -1]
    states = x[:, :-1]
    unique_times = jnp.unique(times)
    n_times = len(unique_times)
    densities = []
    predictors = []

    for i, time in enumerate(unique_times):
        mask = times == time
        n_cells = int(jnp.sum(mask))
        logger.info(
            f"[{i + 1} of {n_times}] Computing density for {n_cells:,} cells "
            f"at time point {time}."
        )
        if n_cells < warn_below:
            logger.warning(
                f"Time point {time} only has {n_cells:,} cells. "
                "This could lead to inaccurate estimation of the time length "
                "scale `ls_time`."
            )
        x_at_time = x[mask, :-1]
        est = DensityEstimator(
            nn_distances=nn_distances[mask], **density_estimator_kwargs
        )
        est.fit(x_at_time)
        densities.append(est.predict(states))
        predictors.append(est)

    densities = jnp.stack(densities)
    corrs = jnp.corrcoef(densities)
    delta_t = jnp.abs(
        unique_times.reshape(-1, 1) - unique_times.reshape(1, -1)
    ).reshape(-1, 1)

    def ls_loss(log_ls):
        ls = jnp.exp(log_ls)
        covs = cov_func_curry(ls)(delta_t, jnp.zeros((1, 1))).reshape(
            (n_times, n_times)
        )
        return jnp.linalg.norm(covs - corrs)

    opt = minimize_lbfgsb(ls_loss, jnp.asarray(0.0))
    ls = float(jnp.exp(opt.pre_transformation))

    if return_data:
        return ls, densities, predictors, unique_times
    return ls
