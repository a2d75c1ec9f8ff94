"""Sequential Monte Carlo with adaptive likelihood tempering.

NEW capability relative to the reference (BASELINE.json north star: "SMC over
the latent GP function ... resampling ... done via collectives").  The
whitened parametrization makes the prior exactly N(0, I), so particles
initialize from the prior and anneal into the posterior along
π_β(z) ∝ N(z; 0, I) · L(z)^β with β adapted so each stage keeps the
effective sample size near a target fraction.

Structure: the outer loop over tempering stages is host-side Python (data
dependent, ~10-40 stages); each stage — weighting, systematic resampling,
and HMC mutation — is one compiled program over the particle batch axis, so
placing particles on a mesh axis shards the sweep across devices (the ESS
reduction and resampling gather become collectives).
"""

import functools
import logging
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .samplers import hmc_init, hmc_kernel

logger = logging.getLogger("mellon_tpu")


@functools.lru_cache(maxsize=None)
def loglik_from_loss(loss_fn):
    """Adapt a negative-log-posterior ``loss_fn(z, *args)`` into the
    likelihood term for tempering (posterior = N(0,I) prior × likelihood).

    Cached so the returned function has a stable identity per ``loss_fn`` —
    the jit key of the compiled SMC stages stays stable across fits.
    """

    def loglik(z, *args):
        dim = z.size
        prior = -0.5 * jnp.sum(z**2) - 0.5 * dim * jnp.log(2 * jnp.pi)
        return -loss_fn(z, *args) - prior

    return loglik


class SMCResult(NamedTuple):
    particles: jnp.ndarray       # (num_particles, dim)
    log_weights: jnp.ndarray     # (num_particles,)
    betas: list                  # tempering schedule actually used
    ess_history: list
    acceptance_history: list
    log_evidence: jnp.ndarray    # log normalizing-constant estimate


def _ess_from_log_weights(log_w):
    log_w = log_w - jax.scipy.special.logsumexp(log_w)
    return jnp.exp(-jax.scipy.special.logsumexp(2 * log_w))


@jax.jit
def _ess_for_beta_step(log_lik, delta):
    return _ess_from_log_weights(delta * log_lik)


def _find_next_beta(log_lik, beta, target_ess_frac, num_particles):
    """Largest admissible beta increment keeping ESS above target via
    bisection on the (host) adaptive-tempering criterion."""
    target = target_ess_frac * num_particles
    lo, hi = 0.0, 1.0 - beta
    if float(_ess_for_beta_step(log_lik, hi)) >= target:
        return 1.0
    for _ in range(30):
        mid = 0.5 * (lo + hi)
        if float(_ess_for_beta_step(log_lik, mid)) >= target:
            lo = mid
        else:
            hi = mid
    return beta + lo


def _systematic_resample(key, log_w, num_particles):
    """Systematic resampling indices from normalized log weights."""
    w = jnp.exp(log_w - jax.scipy.special.logsumexp(log_w))
    positions = (jnp.arange(num_particles) + jax.random.uniform(key)) / num_particles
    cumsum = jnp.cumsum(w)
    return jnp.searchsorted(cumsum, positions)


@partial(
    jax.jit,
    static_argnames=("loglik_fn", "num_mutation_steps", "num_leapfrog_steps"),
)
def _smc_mutate(
    loglik_fn,
    particles,
    keys,
    beta,
    step_size,
    num_mutation_steps,
    num_leapfrog_steps,
    *loglik_args,
):
    """num_mutation_steps HMC transitions per particle targeting π_beta
    (one stable executable; model operands threaded)."""
    dim = particles.shape[1]

    def potential(z):
        prior = -0.5 * jnp.sum(z**2) - 0.5 * dim * jnp.log(2 * jnp.pi)
        return -(prior + beta * loglik_fn(z, *loglik_args))

    kernel = hmc_kernel(potential, num_steps=num_leapfrog_steps)

    def one_chain(z, chain_key):
        state = hmc_init(potential, z)

        def body(i, carry):
            state, acc = carry
            k = jax.random.fold_in(chain_key, i)
            state, info = kernel(state, k, step_size, jnp.ones(dim))
            return state, acc + info.accept_prob

        state, acc = jax.lax.fori_loop(
            0, num_mutation_steps, body, (state, jnp.asarray(0.0))
        )
        return state.z, acc / num_mutation_steps

    return jax.vmap(one_chain)(particles, keys)


@partial(jax.jit, static_argnames=("loglik_fn",))
def _smc_batched_loglik(loglik_fn, particles, *loglik_args):
    return jax.vmap(lambda z: loglik_fn(z, *loglik_args))(particles)


def run_smc(
    loglik_fn,
    dim,
    key,
    num_particles=1024,
    target_ess_frac=0.5,
    num_mutation_steps=5,
    mutation_step_size=0.2,
    num_leapfrog_steps=8,
    max_stages=100,
    prior_sample=None,
    prior_logpdf=None,
    loglik_args=(),
):
    """Anneal particles from N(0, I) (or a custom prior) to the posterior
    ∝ prior · exp(loglik).

    ``loglik_fn`` is either ``f(z)`` or ``f(z, *loglik_args)``; threading the
    operands keeps the compiled stages free of baked constants.  A custom
    prior is only supported with the closure form.

    Returns an :class:`SMCResult`; ``log_evidence`` estimates
    log ∫ prior(z) exp(loglik(z)) dz.
    """
    if (prior_sample is None) != (prior_logpdf is None):
        raise ValueError(
            "Custom priors require BOTH prior_sample and prior_logpdf: with "
            "only one of them the tempering weights and HMC mutations would "
            "silently target the default N(0, I) prior, biasing the "
            "posterior and evidence estimates."
        )
    key, sub = jax.random.split(key)
    if prior_sample is None:
        particles = jax.random.normal(sub, (num_particles, dim))
    else:
        if loglik_args:
            raise ValueError(
                "Custom priors require the closure form of loglik_fn."
            )
        particles = prior_sample(sub, num_particles)

    if prior_sample is not None and prior_logpdf is not None:
        # custom-prior path: fall back to closures (no operand threading)
        base_loglik = loglik_fn

        def threaded_loglik(z):
            return base_loglik(z)

        def mutate_custom(particles, keys, beta, step_size):
            def potential(z):
                return -(prior_logpdf(z) + beta * base_loglik(z))

            kernel = hmc_kernel(potential, num_steps=num_leapfrog_steps)

            def one_chain(z, chain_key):
                state = hmc_init(potential, z)

                def body(i, carry):
                    state, acc = carry
                    k = jax.random.fold_in(chain_key, i)
                    state, info = kernel(state, k, step_size, jnp.ones(dim))
                    return state, acc + info.accept_prob

                state, acc = jax.lax.fori_loop(
                    0, num_mutation_steps, body, (state, jnp.asarray(0.0))
                )
                return state.z, acc / num_mutation_steps

            return jax.vmap(one_chain)(particles, keys)

        batched_loglik = jax.jit(jax.vmap(threaded_loglik))
        mutate = jax.jit(mutate_custom)
    else:
        batched_loglik = lambda p: _smc_batched_loglik(
            loglik_fn, p, *loglik_args
        )
        mutate = lambda p, keys, beta, step: _smc_mutate(
            loglik_fn,
            p,
            keys,
            beta,
            step,
            num_mutation_steps,
            num_leapfrog_steps,
            *loglik_args,
        )

    beta = 0.0
    betas, ess_hist, accept_hist = [], [], []
    log_evidence = jnp.asarray(0.0)
    step_size = mutation_step_size

    for stage in range(max_stages):
        log_lik = batched_loglik(particles)
        new_beta = _find_next_beta(
            log_lik, beta, target_ess_frac, num_particles
        )
        delta = new_beta - beta
        log_w = delta * log_lik
        # evidence increment: log mean exp(delta * loglik)
        log_evidence = log_evidence + jax.scipy.special.logsumexp(
            log_w
        ) - jnp.log(num_particles)
        ess = float(_ess_from_log_weights(log_w))

        key, k_res, k_mut = jax.random.split(key, 3)
        idx = _systematic_resample(k_res, log_w, num_particles)
        particles = particles[idx]

        mut_keys = jax.random.split(k_mut, num_particles)
        particles, accept = mutate(
            particles, mut_keys, jnp.asarray(new_beta), jnp.asarray(step_size)
        )
        mean_accept = float(accept.mean())

        # crude step-size controller towards ~65% acceptance
        if mean_accept < 0.4:
            step_size *= 0.7
        elif mean_accept > 0.85:
            step_size *= 1.3

        betas.append(new_beta)
        ess_hist.append(ess)
        accept_hist.append(mean_accept)
        logger.info(
            "SMC stage %d: beta=%.4f ess=%.0f accept=%.2f step=%.3g",
            stage,
            new_beta,
            ess,
            mean_accept,
            step_size,
        )
        beta = new_beta
        if beta >= 1.0:
            break
    else:
        logger.warning("SMC reached max_stages before beta=1.")

    return SMCResult(
        particles=particles,
        log_weights=jnp.zeros(num_particles),
        betas=betas,
        ess_history=ess_hist,
        acceptance_history=accept_hist,
        log_evidence=log_evidence,
    )


def smc_density_posterior(estimator, num_particles=1024, seed=0, **kwargs):
    """SMC over the whitened latents of a prepared density estimator."""
    if estimator.loss_func is None:
        raise ValueError(
            "Estimator not prepared. Call prepare_inference(x) first."
        )
    dim = int(estimator.initial_value.shape[0])

    loss_fn = getattr(estimator, "_loss_fn", None)
    loss_args = getattr(estimator, "_loss_args", ())
    if loss_fn is None:
        loss_fn, loss_args = estimator.loss_func, ()
    loglik = loglik_from_loss(loss_fn)

    key = jax.random.PRNGKey(seed)
    result = run_smc(
        loglik,
        dim,
        key,
        num_particles=num_particles,
        loglik_args=loss_args,
        **kwargs,
    )
    function_samples = jax.vmap(estimator.transform)(result.particles)
    return result, function_samples
