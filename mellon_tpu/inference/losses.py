"""Whitened transforms and Bayesian loss functions.

Behavioural parity target: ``mellon/inference.py:125-219, 341-372``.
"""

import jax.numpy as jnp

from .likelihoods import nearest_neighbors_likelihood, normal_prior, poisson_likelihood


def compute_transform(mu, L):
    """z -> f = L z + mu (parity: ``mellon/inference.py:125-139``)."""

    def transform(z):
        return L.dot(z) + mu

    return transform


def compute_dimensionality_transform(mu_dim, mu_dens, L):
    """2-row z -> (exp(dim GP), density GP)
    (parity: ``mellon/inference.py:142-164``)."""

    def transform(z):
        dims, dens = z[0, :], z[1, :]
        return jnp.exp(L.dot(dims) + mu_dim), L.dot(dens) + mu_dens

    return transform


def compute_loss_func(nn_distances, d, transform, k):
    """Negative log-posterior of the whitened density model
    (parity: ``mellon/inference.py:167-192``)."""
    prior = normal_prior(k)
    likelihood = nearest_neighbors_likelihood(nn_distances, d)

    def loss_func(z):
        return -(prior(z) + likelihood(transform(z)))

    return loss_func


def compute_dimensionality_loss_func(distances, transform, k):
    """Negative log-posterior of the joint dimension+density model
    (parity: ``mellon/inference.py:195-219``)."""
    prior = normal_prior(k)
    likelihood = poisson_likelihood(distances)

    def loss_func(z):
        dims, log_dens = transform(z)
        return -(prior(z) + likelihood(dims, log_dens))

    return loss_func


def compute_log_density_x(pre_transformation, transform):
    """Function values at the training points
    (parity: ``mellon/inference.py:341-354``)."""
    return transform(pre_transformation)


def compute_parameter_cov_factor(pre_transformation_std, L):
    """Left factor of the mean-function covariance induced by parameter
    uncertainty (parity: ``mellon/inference.py:357-372``)."""
    return L * pre_transformation_std[None, :]
