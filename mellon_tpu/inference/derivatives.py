"""Vmapped autodiff wrappers: per-point gradient, Hessian, slogdet(Hessian).

Behavioural parity target: ``mellon/derivatives.py``.
"""

import jax
import jax.numpy as jnp

from ..utils.validation import validate_1d, validate_float


def derivative(function, x, jit=True):
    """Scalar derivative at each point of a 1-d grid
    (parity: ``mellon/derivatives.py:7-45``)."""

    def get_grad(x):
        return jax.jacrev(function)(x)

    if jnp.isscalar(x):
        x = validate_float(x, "x")
        return get_grad(x)
    x = validate_1d(x)
    if jit:
        get_grad = jax.jit(get_grad)
    return jax.vmap(get_grad, in_axes=(0,))(x).T


def gradient(function, x, *args, jit=True):
    """Per-row gradient of a row-wise scalar function
    (parity: ``mellon/derivatives.py:48-80``)."""

    def get_grad(x, *args):
        return jax.jacrev(function)(x[None, :], *args)

    if jit:
        get_grad = jax.jit(get_grad)
    in_axes = (0,) * (len(args) + 1)
    gradients = jax.vmap(get_grad, in_axes=in_axes)(x, *args)
    if len(gradients.shape) <= 4:
        return gradients.reshape(x.shape)
    return gradients.reshape(gradients.shape[::2])


def hessian(function, x, *args, jit=True):
    """Per-row Hessian (parity: ``mellon/derivatives.py:83-117``)."""
    x = jnp.atleast_2d(x)

    def get_hess(x, *args):
        return jax.jacfwd(jax.jacrev(function))(x[None, :], *args)

    if jit:
        get_hess = jax.jit(get_hess)
    out_shape = x.shape + x.shape[1:]
    in_axes = (0,) * (len(args) + 1)
    hessians = jax.vmap(get_hess, in_axes=in_axes)(x, *args)
    if len(hessians.shape) <= 6:
        return hessians.reshape(out_shape)
    return hessians.reshape(hessians.shape[::2])


def hessian_log_determinant(function, x, *args, jit=True):
    """Per-row sign and log|det| of the Hessian
    (parity: ``mellon/derivatives.py:120-155``)."""
    x = jnp.atleast_2d(x)
    d = x.shape[1]
    hess_shape = (d, d)

    def get_log_det(x, *args):
        hess = jax.jacfwd(jax.jacrev(function))(x[None, :], *args).reshape(hess_shape)
        sign, log_det = jnp.linalg.slogdet(hess)
        return sign, log_det

    if jit:
        get_log_det = jax.jit(get_log_det)
    in_axes = (0,) * (len(args) + 1)
    return jax.vmap(get_log_det, in_axes=in_axes)(x, *args)
