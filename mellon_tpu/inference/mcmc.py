"""Multi-chain MCMC driver with cross-chain warmup adaptation.

NEW capability relative to the reference (see :mod:`.samplers`).  The chain
axis is a plain batch axis: chains run under ``vmap`` inside one compiled
``lax.scan``, so placing the chain axis of the initial state on a
device-mesh axis shards chains across chips (adaptation statistics reduce
across the chain axis, which XLA lowers to ``psum`` over ICI when sharded —
see :func:`mellon_tpu.parallel.sharding.shard_chains`).

Performance contract: the ENTIRE run — three warmup phases and sampling —
is one jitted program keyed on the (static) potential function and shapes;
model operands (e.g. the n×m matrix L of the density model) are threaded as
runtime arguments via ``potential_args``, never baked as constants, so the
executable is small and reused across fits.
"""

import logging
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .samplers import (
    da_init,
    da_update,
    hmc_init,
    hmc_kernel,
    nuts_kernel,
    welford_init,
    welford_update,
    welford_variance,
)

logger = logging.getLogger("mellon_tpu")


class MCMCResult(NamedTuple):
    samples: jnp.ndarray          # (num_chains, num_samples, dim)
    potential: jnp.ndarray        # (num_chains, num_samples)
    accept_prob: jnp.ndarray      # (num_chains, num_samples)
    diverging: jnp.ndarray        # (num_chains, num_samples)
    step_size: jnp.ndarray        # scalar (shared across chains)
    inv_mass_diag: jnp.ndarray    # (dim,)
    num_leapfrog: jnp.ndarray     # (num_chains, num_samples)


@partial(
    jax.jit,
    static_argnames=(
        "potential_fn",
        "algorithm",
        "max_tree_depth",
        "num_leapfrog_steps",
        "num_warmup",
        "num_samples",
        "target_accept",
    ),
)
def _run_mcmc_compiled(
    potential_fn,
    z0,
    key,
    num_warmup,
    num_samples,
    algorithm,
    max_tree_depth,
    num_leapfrog_steps,
    initial_step_size,
    target_accept,
    *potential_args,
):
    pot = (
        (lambda z: potential_fn(z, *potential_args))
        if potential_args
        else potential_fn
    )
    if algorithm == "nuts":
        kernel = nuts_kernel(pot, max_tree_depth=max_tree_depth)
    elif algorithm == "hmc":
        kernel = hmc_kernel(pot, num_steps=num_leapfrog_steps)
    else:
        raise ValueError(f"Unknown MCMC algorithm: {algorithm}")

    num_chains, dim = z0.shape
    batched_kernel = jax.vmap(kernel, in_axes=(0, 0, None, None))
    states = jax.vmap(lambda z: hmc_init(pot, z))(z0)

    n_phase_a = max(num_warmup // 10, 1)
    n_phase_b = max(num_warmup - 2 * n_phase_a, 0)
    n_phase_c = n_phase_a

    # ---- warmup A: step size only, identity mass ---------------------------
    identity_mass = jnp.ones(dim)

    def warmup_a(carry, keys):
        states, da = carry
        new_states, infos = batched_kernel(
            states, keys, jnp.exp(da.log_step), identity_mass
        )
        da = da_update(da, jnp.mean(infos.accept_prob), target=target_accept)
        return (new_states, da), None

    da = da_init(initial_step_size)
    keys_a = jax.random.split(jax.random.fold_in(key, 0), (n_phase_a, num_chains))
    (states, da), _ = jax.lax.scan(warmup_a, (states, da), keys_a)

    # ---- warmup B: step size + Welford mass --------------------------------
    def warmup_b(carry, keys):
        states, da, wf = carry
        new_states, infos = batched_kernel(
            states, keys, jnp.exp(da.log_step), identity_mass
        )
        da = da_update(da, jnp.mean(infos.accept_prob), target=target_accept)
        wf = jax.lax.fori_loop(
            0,
            num_chains,
            lambda i, w: welford_update(w, new_states.z[i]),
            wf,
        )
        return (new_states, da, wf), None

    wf = welford_init(dim)
    keys_b = jax.random.split(jax.random.fold_in(key, 1), (n_phase_b, num_chains))
    (states, da, wf), _ = jax.lax.scan(warmup_b, (states, da, wf), keys_b)
    inv_mass = jnp.where(
        wf.count > 2, welford_variance(wf), identity_mass
    )

    # ---- warmup C: step-size re-adaptation under the new metric ------------
    def warmup_c(carry, keys):
        states, da = carry
        new_states, infos = batched_kernel(
            states, keys, jnp.exp(da.log_step), inv_mass
        )
        da = da_update(da, jnp.mean(infos.accept_prob), target=target_accept)
        return (new_states, da), None

    da = da_init(jnp.exp(da.log_step_avg))
    keys_c = jax.random.split(jax.random.fold_in(key, 2), (n_phase_c, num_chains))
    (states, da), _ = jax.lax.scan(warmup_c, (states, da), keys_c)
    step_size = jnp.exp(da.log_step_avg)

    # ---- sampling ----------------------------------------------------------
    def sample_step(states, keys):
        new_states, infos = batched_kernel(states, keys, step_size, inv_mass)
        out = (
            new_states.z,
            new_states.potential,
            infos.accept_prob,
            infos.diverging,
            infos.num_steps,
        )
        return new_states, out

    keys_s = jax.random.split(
        jax.random.fold_in(key, 3), (num_samples, num_chains)
    )
    states, (zs, pots, accepts, divs, steps) = jax.lax.scan(
        sample_step, states, keys_s
    )

    return MCMCResult(
        samples=jnp.moveaxis(zs, 0, 1),
        potential=jnp.moveaxis(pots, 0, 1),
        accept_prob=jnp.moveaxis(accepts, 0, 1),
        diverging=jnp.moveaxis(divs, 0, 1),
        step_size=step_size,
        inv_mass_diag=inv_mass,
        num_leapfrog=jnp.moveaxis(steps, 0, 1),
    )


@partial(
    jax.jit,
    static_argnames=(
        "potential_fn",
        "algorithm",
        "max_tree_depth",
        "num_leapfrog_steps",
        "num_samples",
    ),
)
def _resume_mcmc_compiled(
    potential_fn,
    z0,
    key,
    num_samples,
    algorithm,
    max_tree_depth,
    num_leapfrog_steps,
    step_size,
    inv_mass,
    *potential_args,
):
    """Sampling-only program: no warmup phases, the adapted step size and
    mass matrix come from a checkpoint (see :mod:`..parallel.checkpoint`)."""
    pot = (
        (lambda z: potential_fn(z, *potential_args))
        if potential_args
        else potential_fn
    )
    if algorithm == "nuts":
        kernel = nuts_kernel(pot, max_tree_depth=max_tree_depth)
    elif algorithm == "hmc":
        kernel = hmc_kernel(pot, num_steps=num_leapfrog_steps)
    else:
        raise ValueError(f"Unknown MCMC algorithm: {algorithm}")

    num_chains, dim = z0.shape
    batched_kernel = jax.vmap(kernel, in_axes=(0, 0, None, None))
    states = jax.vmap(lambda z: hmc_init(pot, z))(z0)

    def sample_step(states, keys):
        new_states, infos = batched_kernel(states, keys, step_size, inv_mass)
        out = (
            new_states.z,
            new_states.potential,
            infos.accept_prob,
            infos.diverging,
            infos.num_steps,
        )
        return new_states, out

    keys_s = jax.random.split(key, (num_samples, num_chains))
    states, (zs, pots, accepts, divs, steps) = jax.lax.scan(
        sample_step, states, keys_s
    )

    return MCMCResult(
        samples=jnp.moveaxis(zs, 0, 1),
        potential=jnp.moveaxis(pots, 0, 1),
        accept_prob=jnp.moveaxis(accepts, 0, 1),
        diverging=jnp.moveaxis(divs, 0, 1),
        step_size=step_size,
        inv_mass_diag=inv_mass,
        num_leapfrog=jnp.moveaxis(steps, 0, 1),
    )


def resume_mcmc(
    potential_fn,
    z0,
    key,
    step_size,
    inv_mass_diag,
    num_samples=500,
    algorithm="nuts",
    max_tree_depth=10,
    num_leapfrog_steps=32,
    chain_sharding=None,
    potential_args=(),
):
    """Continue sampling from a checkpointed sampler state — NO re-warmup.

    The pod-restart path (SURVEY.md §5.4): restore ``z0`` (the chains' last
    positions, e.g. ``result.samples[:, -1, :]``), the adapted ``step_size``
    and ``inv_mass_diag`` from :func:`..parallel.checkpoint.load_sampler_state`,
    optionally reshard onto a DIFFERENT mesh via ``chain_sharding``, and run
    the sampling phase only.  Momenta are drawn fresh (exact: momentum is
    resampled every transition anyway), so the resumed chain targets the
    same stationary distribution with no warmup transient.
    """
    z0 = jnp.atleast_2d(z0)
    if chain_sharding is not None:
        z0 = jax.device_put(z0, chain_sharding)
    return _resume_mcmc_compiled(
        potential_fn,
        z0,
        key,
        int(num_samples),
        algorithm,
        int(max_tree_depth),
        int(num_leapfrog_steps),
        jnp.asarray(step_size),
        jnp.asarray(inv_mass_diag),
        *potential_args,
    )


def run_mcmc(
    potential_fn,
    z0,
    key,
    num_warmup=500,
    num_samples=500,
    num_chains=4,
    algorithm="nuts",
    max_tree_depth=10,
    num_leapfrog_steps=32,
    initial_step_size=0.1,
    target_accept=0.8,
    chain_sharding=None,
    potential_args=(),
):
    """Sample from exp(-potential_fn) with NUTS or HMC.

    Parameters
    ----------
    potential_fn : callable — the negative log density; either ``f(z)`` or
        ``f(z, *potential_args)`` when operands are threaded.
    z0 : (dim,) or (num_chains, dim) initial positions.
    key : PRNG key.
    chain_sharding : optional ``jax.sharding.NamedSharding`` for the chain
        axis; when given, chain states are placed with it so chains run on
        separate devices.
    potential_args : tuple of arrays passed through to ``potential_fn`` as
        runtime arguments (keeps large operands out of the executable).

    Returns
    -------
    MCMCResult with samples of shape (num_chains, num_samples, dim).
    """
    z0 = jnp.atleast_2d(z0)
    if z0.shape[0] == 1 and num_chains > 1:
        key, sub = jax.random.split(key)
        z0 = z0 + 0.1 * jax.random.normal(sub, (num_chains, z0.shape[1]))
    if chain_sharding is not None:
        z0 = jax.device_put(z0, chain_sharding)

    return _run_mcmc_compiled(
        potential_fn,
        z0,
        key,
        int(num_warmup),
        int(num_samples),
        algorithm,
        int(max_tree_depth),
        int(num_leapfrog_steps),
        jnp.asarray(initial_step_size),
        float(target_accept),
        *potential_args,
    )


def sample_density_posterior(
    estimator,
    num_warmup=500,
    num_samples=500,
    num_chains=4,
    algorithm="nuts",
    seed=0,
    precision=None,
    **kwargs,
):
    """Draw posterior samples of the latent GP function of a fitted (or
    prepared) density estimator and return (MCMCResult, function samples).

    This supersedes the reference's Laplace/ADVI posterior approximations
    with exact MCMC over the whitened latents z; the function-space samples
    are ``transform(z) = L z + mu`` applied per draw.
    """
    if estimator.loss_func is None:
        raise ValueError(
            "Estimator not prepared. Call prepare_inference(x) first."
        )
    # use the operand-threaded static loss when the estimator provides it
    potential_fn = getattr(estimator, "_loss_fn", None)
    potential_args = getattr(estimator, "_loss_args", ())
    if potential_fn is None:
        potential_fn = estimator.loss_func
        potential_args = ()
    if precision == "bf16":
        # store the matrix operands in bfloat16: halves the HBM traffic of
        # each leapfrog (~1.9x measured) while the matvec still accumulates
        # in f32; perturbs the target by ~1e-3 relative (PERFORMANCE.md)
        potential_args = tuple(
            a.astype(jnp.bfloat16)
            if getattr(a, "ndim", 0) == 2 and a.dtype == jnp.float32
            else a
            for a in potential_args
        )
    elif precision is not None:
        raise ValueError(f"Unknown precision option: {precision}")
    z0 = estimator.initial_value
    if getattr(estimator, "pre_transformation", None) is not None:
        z0 = estimator.pre_transformation
    key = jax.random.PRNGKey(seed)
    result = run_mcmc(
        potential_fn,
        z0,
        key,
        num_warmup=num_warmup,
        num_samples=num_samples,
        num_chains=num_chains,
        algorithm=algorithm,
        potential_args=potential_args,
        **kwargs,
    )
    transform = estimator.transform
    flat = result.samples.reshape((-1,) + result.samples.shape[2:])
    function_samples = jax.vmap(transform)(flat)
    return result, function_samples
