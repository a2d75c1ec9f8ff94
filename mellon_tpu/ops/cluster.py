"""On-device k-means for landmark selection.

Replaces sklearn's host-side ``k_means`` (``mellon/parameters.py:243-291``).
TPU-first design: Lloyd iterations under ``lax.scan`` with assignment by
blocked distance-argmin (one MXU matmul per block) and centroid update by
``segment_sum`` — fully jittable, deterministic under a seed, and shardable
over the cells axis.
"""

import logging
from functools import partial

import jax
import jax.numpy as jnp

from ..utils.util import distance

logger = logging.getLogger("mellon_tpu")

DEFAULT_N_ITER = 30
DEFAULT_ASSIGN_BLOCK = 4096


def _assign(x, centroids, block_size):
    """Nearest-centroid index per row of x, computed in row blocks."""
    n = x.shape[0]
    n_blocks = -(-n // block_size)
    pad = n_blocks * block_size - n
    xp = jnp.concatenate(
        [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], axis=0
    ).reshape(n_blocks, block_size, x.shape[1])

    def block_argmin(xb):
        d = distance(xb, centroids)
        return jnp.argmin(d, axis=1)

    idx = jax.lax.map(block_argmin, xp).reshape(n_blocks * block_size)[:n]
    return idx


@partial(jax.jit, static_argnames=("k", "n_iter", "block_size"))
def _lloyd(x, init_centroids, k, n_iter, block_size):
    def step(centroids, _):
        idx = _assign(x, centroids, block_size)
        sums = jax.ops.segment_sum(x, idx, num_segments=k)
        counts = jax.ops.segment_sum(
            jnp.ones((x.shape[0],), dtype=x.dtype), idx, num_segments=k
        )
        new_centroids = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centroids
        )
        return new_centroids, None

    centroids, _ = jax.lax.scan(step, init_centroids, None, length=n_iter)
    return centroids


def k_means(
    x,
    k,
    n_iter=DEFAULT_N_ITER,
    random_state=0,
    block_size=DEFAULT_ASSIGN_BLOCK,
):
    """Seeded Lloyd k-means returning the (k, d) centroids.

    Initialization samples k distinct data points uniformly (seeded); for
    landmark quantization this matches the quality of kmeans++ after a few
    Lloyd sweeps at a fraction of the cost for k ~ 5000.
    """
    x = jnp.atleast_2d(x)
    n = x.shape[0]
    if k > n:
        raise ValueError(f"k={k} must not exceed the number of points {n}.")
    key = jax.random.PRNGKey(int(random_state))
    init_idx = jax.random.choice(key, n, shape=(k,), replace=False)
    init_centroids = x[init_idx]
    block = int(min(block_size, n))
    return _lloyd(x, init_centroids, int(k), int(n_iter), block)
