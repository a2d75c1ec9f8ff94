"""Priors and likelihoods of the whitened sparse-GP density model.

Behavioural parity target: ``mellon/inference.py:35-122``.  These are the
innermost functions of the whole framework — every optimizer step, ADVI
sample, HMC leapfrog and SMC weight update evaluates them.  They are pure,
jit-safe, and shard cleanly over the cells axis (the sums over cells become
``psum`` under ``shard_map``; see :mod:`mellon_tpu.parallel`).
"""

import jax.numpy as jnp
from jax.scipy.special import gammaln


def normal_prior(k):
    """Log-pdf of z ~ N(0, I_k) (parity: ``mellon/inference.py:35-48``)."""

    def logpdf(z):
        return -(1 / 2) * jnp.sum(z**2) - (k / 2) * jnp.log(2 * jnp.pi)

    return logpdf


def nearest_neighbors_likelihood(r, d):
    """Likelihood of log-density given observed 1-NN distances r in
    dimension d (parity: ``mellon/inference.py:72-92``).

    The model: the 1-NN distance of a point in a Poisson process with rate
    rho is governed by the volume V(r) of the d-sphere;
    log P(r | log rho) = log rho + log V'(r) - exp(log rho + V(r)).
    ``V`` and ``Vdr`` are precomputed constants so each evaluation is one
    exp + adds over the cells axis.
    """
    const = (d * jnp.log(jnp.pi) / 2) - gammaln(d / 2 + 1)
    V = jnp.log(r) * d + const
    Vdr = jnp.log(d) + ((d - 1) * jnp.log(r)) + const

    def logpdf(log_density):
        A = jnp.exp(log_density + V)
        B = log_density + Vdr
        return jnp.sum(B - A)

    return logpdf


def poisson_likelihood(distances):
    """Joint k-NN Poisson likelihood of (local dimension, log density)
    (parity: ``mellon/inference.py:95-122``).

    ``distances`` has shape (n, k); counts 1..k are compared against the
    expected counts in growing spheres of log-volume ``V(d)``.
    """
    k = distances.shape[1]
    counts = jnp.arange(1, k + 1)
    ldist = jnp.sort(distances, axis=-1)
    ldist = jnp.log(ldist) + jnp.log(jnp.pi) / 2

    def V(d):
        return d * ldist - gammaln(d / 2 + 1)

    def logpdf(dims, log_dens):
        pred = log_dens[:, None] + V(dims[:, None])
        logp = pred * counts[None, :] - jnp.exp(pred) - gammaln(counts)[None, :]
        return jnp.sum(logp)

    return logpdf
