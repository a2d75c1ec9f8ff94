"""Pallas TPU kernels for the hot compute tiles.

The single hottest op of the framework is construction of kernel
cross-covariance blocks k(X, Y) — an (n, m) tile per predictor evaluation,
conditional solve, and L build (SURVEY.md §3.3: "HOT: n_new × m kernel
block").  The Pallas kernel fuses the pairwise-distance matmul (MXU) with
the Matern/RBF elementwise math (VPU) in one VMEM-resident pass per
(block_n × block_m) tile: HBM traffic is exactly one read of each X/Y strip
and one write of the output tile — no intermediate (n, m) distance matrix
round-trips.

The implementation is optional: ``matern52_gram`` falls back to the XLA
composition off-TPU (and under ``interpret=True`` runs anywhere for tests).
"""

import functools
import logging

import jax
import jax.numpy as jnp

logger = logging.getLogger("mellon_tpu")

try:  # pallas import is deferred-safe: CPU-only installs still work
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except ImportError:  # pragma: no cover
    HAS_PALLAS = False

DEFAULT_BLOCK_N = 256
DEFAULT_BLOCK_M = 256


def _matern52_tile_kernel(x_ref, y_ref, out_ref, *, ls):
    """One (block_n, block_m) tile: distances via MXU matmul, Matern-5/2
    elementwise on the VPU, all in VMEM."""
    x = x_ref[:]                      # (bn, d)
    y = y_ref[:]                      # (bm, d)
    xx = jnp.sum(x * x, axis=1)[:, None]
    yy = jnp.sum(y * y, axis=1)[None, :]
    xy = jax.lax.dot_general(
        x,
        y,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sq = xx - 2.0 * xy + yy + 1e-12
    dist = jnp.sqrt(jnp.maximum(sq, 0.0))
    r = (jnp.sqrt(5.0) / ls) * dist
    out_ref[:] = ((r + r * r / 3.0 + 1.0) * jnp.exp(-r)).astype(out_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("ls", "block_n", "block_m", "interpret")
)
def matern52_gram_pallas(
    x, y, ls, block_n=DEFAULT_BLOCK_N, block_m=DEFAULT_BLOCK_M, interpret=False
):
    """Fused Matern-5/2 cross-covariance k(x, y) as a Pallas grid of
    VMEM-resident tiles."""
    n, d = x.shape
    m = y.shape[0]
    n_pad = _round_up(n, block_n)
    m_pad = _round_up(m, block_m)
    # feature axis padded to the f32 lane-friendly multiple of 8
    d_pad = _round_up(d, 8)
    x_p = jnp.zeros((n_pad, d_pad), dtype=jnp.float32).at[:n, :d].set(x)
    y_p = jnp.zeros((m_pad, d_pad), dtype=jnp.float32).at[:m, :d].set(y)

    grid = (n_pad // block_n, m_pad // block_m)
    out = pl.pallas_call(
        functools.partial(_matern52_tile_kernel, ls=float(ls)),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_n, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_m, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_n, block_m), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x_p, y_p)
    return out[:n, :m]


def matern52_gram(x, y, ls, interpret=False):
    """Matern-5/2 cross-covariance with the Pallas fast path on TPU and the
    XLA composition elsewhere."""
    on_tpu = jax.default_backend() in ("tpu", "axon") or any(
        getattr(dev, "platform", "") in ("tpu", "axon") for dev in jax.devices()
    )
    if HAS_PALLAS and (on_tpu or interpret):
        try:
            return matern52_gram_pallas(x, y, float(ls), interpret=interpret)
        except Exception as e:  # pragma: no cover - fallback safety
            logger.warning("Pallas matern52 kernel failed (%s); using XLA.", e)
    from ..utils.util import distance

    r = jnp.sqrt(5.0) * distance(x, y) / ls
    return (r + jnp.square(r) / 3 + 1) * jnp.exp(-r)
