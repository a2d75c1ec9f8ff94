"""Automatic time length-scale selection.

Behavioural parity target: ``mellon/compute_ls_time.py``: fit one density
model per unique time point, correlate the per-time density fields, and fit
the time-kernel length scale to match the correlations (the L-BFGS fit runs
on device via :func:`mellon_tpu.inference.optimizers.minimize_lbfgsb`).

TPU-first redesign of the per-time fits (SURVEY.md §7 "hard part": the
reference nests a full serial DensityEstimator fit per time point,
``mellon/compute_ls_time.py:66-85``): in the default configuration every
per-time model takes the FULL-GP path (per-time cell counts are below the
5000-landmark default), so all T fits are expressed as ONE batched, masked
program — groups padded to a common width, per-group kernel matrices
Cholesky-factorized under ``vmap``, and a single joint L-BFGS over the
stacked whitened latents (the per-group losses are independent, so the
joint optimum coincides with the per-group optima; padded latent entries
have exactly zero gradient and stay at their zero initialization, making
the masked fit EXACT for the real cells).  This removes T serial optimizer
runs and, on shape-sensitive backends, T distinct program compilations —
ragged group sizes all share one padded executable.
"""

import logging

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular
from jax.scipy.special import gammaln

from ..inference.optimizers import minimize_lbfgsb
from ..utils.util import DEFAULT_JITTER, mle
from ..utils.validation import validate_time_x

logger = logging.getLogger("mellon_tpu")

# above this per-time cell count the batched FULL-GP fit's (T, n_pad²)
# kernel stack outgrows its value (and the reference's own per-time models
# would go sparse); fall back to the per-time loop
BATCH_GROUP_CAP = 4096
# keys of density_estimator_kwargs the batched path knows how to honor
_BATCHABLE_KEYS = {
    "cov_func_curry",
    "d_method",
    "d",
    "optimizer",
    "ls",
    "ls_factor",
    "jit",
    "mu",
    "jitter",
}


def _masked_quantile_01(values, mask, n_real):
    """1%-quantile (linear interpolation) of ``values`` where ``mask`` is
    set — equals ``jnp.quantile(values[mask], 0.01)`` with a static shape."""
    padded = jnp.where(mask > 0, values, jnp.inf)
    srt = jnp.sort(padded)
    pos = 0.01 * (n_real - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, srt.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, srt.shape[0] - 1)
    w = pos - lo
    v_hi = jnp.where(hi < n_real, srt[hi], srt[lo])
    return srt[lo] * (1.0 - w) + v_hi * w


def _batched_density_loss(zflat, L_stack, nng, mask, mu_t, d):
    """Sum of the T masked whitened density losses.  Identical math to
    ``inference.losses.density_loss`` per group; padded cells contribute a
    masked-out likelihood term and a prior term whose gradient is zero at
    the zero initialization, so they never move."""
    T, n_pad, _ = L_stack.shape
    Z = zflat.reshape(T, n_pad)
    F = jnp.einsum("tij,tj->ti", L_stack, Z) + mu_t[:, None]
    const = (d * jnp.log(jnp.pi) / 2) - gammaln(d / 2 + 1)
    V = jnp.log(nng) * d + const
    Vdr = jnp.log(d) + (d - 1) * jnp.log(nng) + const
    A = jnp.exp(F + V)
    B = F + Vdr
    loglik = jnp.sum(mask * (B - A))
    prior = -0.5 * jnp.sum(Z**2) - (Z.size / 2) * jnp.log(2 * jnp.pi)
    return -(prior + loglik)


def _batched_ls_time_densities(
    x, nn_distances, cov_func_curry, kw, unique_times, warn_below
):
    """Densities (T, n) from one batched masked FULL-GP fit, or None when
    the configuration requires the exact per-time loop."""
    import numpy as np

    from ..parameters import compute_cov_func

    extra = set(kw) - _BATCHABLE_KEYS
    if extra:
        return None
    if kw.get("optimizer") not in (None, "L-BFGS-B"):
        return None
    d_method = kw.get("d_method")
    d_given = kw.get("d")
    if d_method == "fractal":
        return None  # per-group fractal dimension needs the loop
    if d_method == "manual" and d_given is None:
        return None  # let the per-time estimator raise its documented error
    try:
        template = compute_cov_func(cov_func_curry, 1.0)
        spec, params0 = template.operand_spec()
    except (NotImplementedError, TypeError):
        return None
    if len(params0) != 1:
        return None  # only single-length-scale kernels are batched

    times = np.asarray(x[:, -1])
    ut = np.asarray(unique_times)
    sizes = np.asarray([(times == t).sum() for t in ut])
    if sizes.max() > BATCH_GROUP_CAP or sizes.min() < 2:
        return None

    states = x[:, :-1]
    ds = states.shape[1]
    d = float(d_given) if d_given is not None else float(ds)
    if d > 50:
        return None  # the per-time estimator raises the documented error
    T = len(ut)
    n_pad = int(sizes.max())
    jitter = float(kw.get("jitter") or DEFAULT_JITTER)

    logger.info(
        f"Batched ls_time fits: {T} time points padded to {n_pad:,} cells "
        "run as one masked FULL-GP program (joint L-BFGS over all groups)."
    )
    for t, n_cells in zip(ut, sizes):
        if n_cells < warn_below:
            logger.warning(
                f"Time point {t} only has {n_cells:,} cells. "
                "This could lead to inaccurate estimation of the time "
                "length scale `ls_time`."
            )

    x_np = np.asarray(states)
    nn_np = np.asarray(nn_distances)
    xg = np.zeros((T, n_pad, ds), dtype=x_np.dtype)
    nng = np.ones((T, n_pad), dtype=nn_np.dtype)
    mask = np.zeros((T, n_pad), dtype=x_np.dtype)
    for i, t in enumerate(ut):
        sel = times == t
        k = int(sel.sum())
        xg[i, :k] = x_np[sel]
        nng[i, :k] = nn_np[sel]
        mask[i, :k] = 1.0
    xg, nng, mask = jnp.asarray(xg), jnp.asarray(nng), jnp.asarray(mask)
    n_t = jnp.asarray(sizes, dtype=xg.dtype)

    ls_given = kw.get("ls")
    ls_factor = float(kw.get("ls_factor") or 1)
    mu_given = kw.get("mu")

    @jax.jit
    def prep(xg, nng, mask, n_t):
        mle_g = mle(nng, d)
        if mu_given is not None:
            mu_t = jnp.full((T,), float(mu_given), dtype=xg.dtype)
        else:
            mu_t = (
                jax.vmap(_masked_quantile_01)(mle_g, mask, n_t) - 10.0
            )
        if ls_given is not None:
            ls_t = jnp.full((T,), float(ls_given), dtype=xg.dtype)
        else:
            log_mean = jnp.sum(jnp.log(nng) * mask, axis=1) / n_t
            ls_t = jnp.exp(log_mean + 3.0) * ls_factor

        def chol_one(xg_t, mask_t, ls_g):
            from ..ops.kernels import eval_operand_spec

            K = eval_operand_spec(spec, (ls_g,), xg_t, xg_t)
            m2 = mask_t[:, None] * mask_t[None, :]
            K_m = K * m2 + jnp.diag(1.0 - mask_t)
            diag = jnp.arange(K_m.shape[0])
            return jnp.linalg.cholesky(K_m.at[diag, diag].add(jitter))

        L_stack = jax.vmap(chol_one)(xg, mask, ls_t)

        # masked ridge warm start: (LᵀWL + I) z = LᵀW (mle − mu)
        def ridge_one(L_t, mask_t, target_t):
            Lw = L_t * mask_t[:, None]
            G = Lw.T @ (L_t * mask_t[:, None])
            diag = jnp.arange(G.shape[0])
            rhs = Lw.T @ (target_t * mask_t)
            return jnp.linalg.solve(G.at[diag, diag].add(1.0), rhs)

        z0 = jax.vmap(ridge_one)(L_stack, mask, mle_g - mu_t[:, None])
        return L_stack, mu_t, ls_t, z0

    L_stack, mu_t, ls_t, z0 = prep(xg, nng, mask, n_t)

    res = minimize_lbfgsb(
        _batched_density_loss,
        jnp.ravel(z0),
        loss_args=(L_stack, nng, mask, mu_t, jnp.asarray(d, dtype=xg.dtype)),
    )
    Z = res.pre_transformation.reshape(T, n_pad)

    @jax.jit
    def predict(states, xg, L_stack, Z, ls_t, mu_t):
        def one(op):
            xg_t, L_t, z_t, ls_g, mu_g = op
            from ..ops.kernels import eval_operand_spec

            w = solve_triangular(L_t.T, z_t, lower=False)
            Ks = eval_operand_spec(spec, (ls_g,), states, xg_t)
            return mu_g + Ks @ w

        return jax.lax.map(one, (xg, L_stack, Z, ls_t, mu_t))

    return predict(states, xg, L_stack, Z, ls_t, mu_t)


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
    (parity: ``mellon/compute_ls_time.py:12-104``).

    In the default configuration the per-time fits run as one batched
    masked program (see module docstring); ``return_data=True`` or any
    configuration the batch cannot express exactly falls back to the
    reference's per-time loop.
    """
    from .density import DensityEstimator

    x = validate_time_x(x, times)
    times = x[:, -1]
    states = x[:, :-1]
    unique_times = jnp.unique(times)
    n_times = len(unique_times)

    densities = None
    if not return_data:
        densities = _batched_ls_time_densities(
            x,
            nn_distances,
            cov_func_curry,
            density_estimator_kwargs,
            unique_times,
            warn_below,
        )

    predictors = []
    if densities is None:
        per_time = []
        for i, time in enumerate(unique_times):
            mask = times == time
            n_cells = int(jnp.sum(mask))
            logger.info(
                f"[{i + 1} of {n_times}] Computing density for {n_cells:,} "
                f"cells at time point {time}."
            )
            if n_cells < warn_below:
                logger.warning(
                    f"Time point {time} only has {n_cells:,} cells. "
                    "This could lead to inaccurate estimation of the time "
                    "length scale `ls_time`."
                )
            x_at_time = x[mask, :-1]
            est = DensityEstimator(
                nn_distances=nn_distances[mask], **density_estimator_kwargs
            )
            est.fit(x_at_time)
            per_time.append(est.predict(states))
            predictors.append(est)
        densities = jnp.stack(per_time)

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
