"""Diagonal Laplace approximation of posterior standard deviations.

Behavioural parity target: ``mellon/inference.py:291-338``: the Hessian
diagonal of the negative log-posterior at the MAP, extracted with
forward-over-reverse HVPs, clipped at 1e-8, and inverted to standard
deviations.

TPU note: the HVP basis sweep is chunked (``batch_size``) so the k HVPs run
as vmapped groups without materializing a k×k Hessian; each HVP is two
passes over the O(n·m) loss graph.
"""

import logging

import jax
import jax.numpy as jnp

logger = logging.getLogger("mellon_tpu")


def hessian_diagonal(loss_func, z, batch_size=512):
    """Diagonal of the Hessian of loss_func at z via chunked HVPs."""
    grad_f = jax.grad(loss_func)
    flat = z.reshape(-1)
    k = flat.shape[0]

    def hvp_diag(e_flat):
        e = e_flat.reshape(z.shape)
        _, hvp = jax.jvp(grad_f, (z,), (e,))
        return jnp.vdot(hvp, e)

    chunks = []
    for start in range(0, k, batch_size):
        stop = min(start + batch_size, k)
        basis = jnp.zeros((stop - start, k), dtype=z.dtype)
        basis = basis.at[jnp.arange(stop - start), jnp.arange(start, stop)].set(1.0)
        chunks.append(jax.vmap(hvp_diag)(basis))
    return jnp.concatenate(chunks).reshape(z.shape)


def compute_laplace_std(loss_func, pre_transformation, jit=False, batch_size=512):
    """Posterior std = 1/sqrt(clip(diag Hessian, 1e-8))
    (parity: ``mellon/inference.py:291-338``)."""
    h_diag = hessian_diagonal(loss_func, pre_transformation, batch_size=batch_size)
    h_diag = jnp.maximum(h_diag, 1e-8)
    stds = 1.0 / jnp.sqrt(h_diag)
    logger.info(
        "Laplace approximation: Hessian diagonal range [%.3e, %.3e], "
        "std range [%.3e, %.3e].",
        float(jnp.min(h_diag)),
        float(jnp.max(h_diag)),
        float(jnp.min(stds)),
        float(jnp.max(stds)),
    )
    return stds
