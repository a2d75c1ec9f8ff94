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

import logging
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .samplers import hmc_init, hmc_kernel

logger = logging.getLogger("mellon_tpu")


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
):
    """Anneal particles from N(0, I) (or a custom prior) to the posterior
    ∝ prior · exp(loglik).

    Returns an :class:`SMCResult`; ``log_evidence`` estimates
    log ∫ prior(z) exp(loglik(z)) dz.
    """
    key, sub = jax.random.split(key)
    if prior_sample is None:
        particles = jax.random.normal(sub, (num_particles, dim))
        prior_logpdf = lambda z: -0.5 * jnp.sum(z**2) - 0.5 * dim * jnp.log(
            2 * jnp.pi
        )
    else:
        particles = prior_sample(sub, num_particles)

    batched_loglik = jax.jit(jax.vmap(loglik_fn))

    @jax.jit
    def mutate(particles, keys, beta, step_size):
        """num_mutation_steps HMC transitions targeting π_beta."""

        def potential(z):
            return -(prior_logpdf(z) + beta * loglik_fn(z))

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

    def prior_logpdf(z):
        return -0.5 * jnp.sum(z**2) - 0.5 * dim * jnp.log(2 * jnp.pi)

    loss = estimator.loss_func

    def loglik(z):
        return -loss(z) - prior_logpdf(z)

    key = jax.random.PRNGKey(seed)
    result = run_smc(
        loglik, dim, key, num_particles=num_particles, **kwargs
    )
    function_samples = jax.vmap(estimator.transform)(result.particles)
    return result, function_samples
