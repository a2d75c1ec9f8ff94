"""Extended-precision (double-single) matrix products on the MXU.

Why this exists (SURVEY.md §7 "Precision"; VERDICT r3 Missing #2): at the
reference's 98k-cell d=2 time-series shape the product kernel saturates and
the landmark matrix K_uu is so ill-conditioned that the sparse-GP
factorization L = C Lp⁻ᵀ amplifies f32 rounding by ~cond(Lp) — the f32
triangular solve against a (host-f64) factor certifies only corr 0.76
against the reference's fully-f64 pipeline.  The reference never sees this
because it runs float64 on the host (``mellon/__init__.py:44-59``);
a TPU-native path needs f64-EQUIVALENT arithmetic without f64 hardware.

The scheme (Ozaki-style error-free slicing, adapted to the TPU MXU):

* The ill-conditioned triangular factor is inverted ONCE on the host in
  f64 (m×m, seconds) and shipped as a double-single pair
  ``B = B_hi + B_lo`` of f32 arrays — 48 effective mantissa bits.
* The big (n, m) × (m, m) product ``A @ B`` runs on device as a sum of
  bf16×bf16→f32 matmuls over *fixed-point slices*: rows of A and columns
  of B are scaled by powers of two into [-1, 1), then cut into 8-bit
  slices on an ABSOLUTE binary grid (slice k holds bits [8k, 8(k+1)) of
  the scaled value), so every slice is exactly bf16-representable and the
  product of two slices is an exact multiple of a common grid.  With
  contraction chunks of ≤128 terms the f32 accumulator inside the MXU
  pass stays within 23 bits of the grid — every chunk partial sum is
  EXACT, not merely rounded.
* Chunk partials and slice-pair partials combine on the VPU in
  double-single arithmetic (TwoSum), so the only unrecoverable errors are
  the dropped high-order slice pairs (≤ 2⁻⁴⁰ of the accumulation
  amplitude) and the f32 representation of A itself.

Cost: ``len(kept pairs)`` (20 by default) bf16 MXU passes over the data —
about 20× a plain bf16 matmul's FLOPs, still MXU-bound and orders of
magnitude faster than a host round trip at (98k, 5000).

No reference counterpart exists (the reference is host-f64 end to end).
"""

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("mellon_tpu")

# 8-bit slices: bf16 has an 8-bit significand (7 explicit + 1 implicit),
# so an 8-bit fixed-point slice is exactly representable
SLICE_BITS = 8
# contraction-chunk length: products of two 8-bit slices live on a 16-bit
# grid; 2^7 = 128 of them sum to <= 23 bits — exactly representable in the
# f32 accumulator of a bf16 MXU pass
CHUNK_K = 128
# number of slices of the f32 A operand and of the double-single B
# operand (6 x 8 = 48 bits).  A needs FIVE slices, not three: the slices
# live on an absolute per-row grid, so an element 2^-8k below its row
# maximum only keeps 24 - 8k of its f32 bits — with 5 slices every
# element >= 2^-16 of the row max is captured in full, and the truncation
# floor drops to ~2^-41 of the accumulation amplitude (measured: 3 slices
# floor at ~1e-7 of amplitude, which is no better than a compensated f32
# product under heavy cancellation)
A_SLICES = 5
B_SLICES = 6
# keep slice pairs with i + j <= MAX_PAIR: dropped pairs contribute
# <= ~2^-(8*(MAX_PAIR+1)) of the accumulation amplitude
MAX_PAIR = 5


def _two_sum(a, b):
    """Error-free transformation: a + b = s + e exactly (Knuth TwoSum,
    branch-free, 6 flops — no FMA required)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _ds_add(hi, lo, v):
    """Add an f32 value to a double-single accumulator."""
    s, e = _two_sum(hi, v)
    return s, lo + e


def _pow2_scale(max_abs):
    """Exact power-of-two scale 2**e with |x| / 2**e < 1 for |x| <= max_abs."""
    e = jnp.floor(jnp.log2(jnp.maximum(max_abs, 1e-38))) + 1.0
    return jnp.exp2(e), e


def _fixed_point_slices(x_scaled, n_slices, extra=None, extra_after=None):
    """Cut |x| < 1 into ``n_slices`` 8-bit slices on the absolute binary
    grid: slice k is a multiple of 2^-8(k+1) with |slice| <= 2^-8k —
    exactly bf16-representable.  ``extra`` (same shape) is added to the
    residual after ``extra_after`` slices (used to append the low word of
    a double-single operand once the high word's bits are exhausted)."""
    slices = []
    r = x_scaled
    for k in range(n_slices):
        g = float(2.0 ** (-SLICE_BITS * (k + 1)))
        s = jnp.round(r * (1.0 / g)) * g
        slices.append(s.astype(jnp.bfloat16))
        r = r - s
        if extra is not None and k + 1 == extra_after:
            r = r + extra
    return slices


def _kept_pairs(a_slices=None, b_slices=None, max_pair=None):
    return [
        (i, j)
        for i in range(a_slices if a_slices is not None else A_SLICES)
        for j in range(b_slices if b_slices is not None else B_SLICES)
        if i + j <= (max_pair if max_pair is not None else MAX_PAIR)
    ]


@partial(jax.jit, static_argnames=("with_ds",))
def _ds_matmul_block(A, B_hi, B_lo, with_ds=False):
    """One row-block of the extended-precision product A @ (B_hi + B_lo).

    A: (nb, K) f32;  B_hi/B_lo: (K, M) f32 double-single pair.
    Returns f32 (nb, M), or the (hi, lo) pair when ``with_ds``.
    """
    nb, K = A.shape
    M = B_hi.shape[1]

    # --- per-row / per-column power-of-two scaling -------------------------
    a_scale, a_e = _pow2_scale(jnp.max(jnp.abs(A), axis=1, keepdims=True))
    b_max = jnp.maximum(
        jnp.max(jnp.abs(B_hi), axis=0, keepdims=True),
        jnp.max(jnp.abs(B_lo), axis=0, keepdims=True) * 0,
    )
    b_scale, b_e = _pow2_scale(b_max)
    As = A / a_scale
    Bs_hi = B_hi / b_scale
    Bs_lo = B_lo / b_scale

    # --- fixed-point slicing ----------------------------------------------
    a_slices = _fixed_point_slices(As, A_SLICES)
    b_slices = _fixed_point_slices(
        Bs_hi, B_SLICES, extra=Bs_lo, extra_after=3
    )
    pairs = _kept_pairs()

    # --- pad the contraction axis to a CHUNK_K multiple --------------------
    n_chunks = -(-K // CHUNK_K)
    Kp = n_chunks * CHUNK_K
    if Kp != K:
        pad_a = [(0, 0), (0, Kp - K)]
        pad_b = [(0, Kp - K), (0, 0)]
        a_slices = [jnp.pad(s, pad_a) for s in a_slices]
        b_slices = [jnp.pad(s, pad_b) for s in b_slices]

    a_stack = jnp.stack(a_slices)          # (A_SLICES, nb, Kp) bf16
    b_stack = jnp.stack(b_slices)          # (B_SLICES, Kp, M) bf16
    # add small-magnitude pairs first so the double-single accumulator's
    # low word absorbs them before the large pairs land
    pairs.sort(key=lambda ij: -(ij[0] + ij[1]))

    def chunk_body(carry, c):
        hi, lo = carry
        a_c = jax.lax.dynamic_slice(
            a_stack, (0, 0, c * CHUNK_K), (A_SLICES, nb, CHUNK_K)
        )
        b_c = jax.lax.dynamic_slice(
            b_stack, (0, c * CHUNK_K, 0), (B_SLICES, CHUNK_K, M)
        )
        for i, j in pairs:
            # exact chunk partial: bf16 x bf16 products on a common grid,
            # f32-accumulated within 23 bits
            p = jnp.matmul(
                a_c[i], b_c[j], preferred_element_type=jnp.float32
            )
            hi, lo = _ds_add(hi, lo, p)
        return (hi, lo), None

    init = (
        jnp.zeros((nb, M), dtype=jnp.float32),
        jnp.zeros((nb, M), dtype=jnp.float32),
    )
    (hi, lo), _ = jax.lax.scan(
        chunk_body, init, jnp.arange(n_chunks)
    )

    # --- undo the exact power-of-two scaling -------------------------------
    unscale = jnp.exp2(a_e + b_e)
    hi = hi * unscale
    lo = lo * unscale
    if with_ds:
        return hi, lo
    return hi + lo


def ds_matmul(A, B_hi, B_lo, block_rows=16384, with_ds=False):
    """Extended-precision A @ (B_hi + B_lo) with ~2⁻⁴⁰-relative
    accumulation error, row-blocked so one shape-stable executable serves
    arbitrarily large n.

    A : (n, K) f32 device array.
    B_hi, B_lo : (K, M) f32 double-single pair (e.g. from
        :func:`ds_from_f64`).
    """
    A = jnp.asarray(A, jnp.float32)
    n = A.shape[0]
    if n <= block_rows:
        return _ds_matmul_block(A, B_hi, B_lo, with_ds=with_ds)
    outs = []
    for start in range(0, n, block_rows):
        Ai = A[start : start + block_rows]
        if Ai.shape[0] < block_rows:
            Ai = jnp.pad(Ai, [(0, block_rows - Ai.shape[0]), (0, 0)])
        outs.append(_ds_matmul_block(Ai, B_hi, B_lo, with_ds=with_ds))
    if with_ds:
        hi = jnp.concatenate([o[0] for o in outs], axis=0)[:n]
        lo = jnp.concatenate([o[1] for o in outs], axis=0)[:n]
        return hi, lo
    return jnp.concatenate(outs, axis=0)[:n]


def ds_from_f64(X64):
    """Double-single (hi, lo) f32 pair of a host float64 array — exact to
    ~2⁻⁴⁸ relative."""
    X64 = np.asarray(X64, dtype=np.float64)
    hi = X64.astype(np.float32)
    lo = (X64 - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def host_triangular_inverse_ds(Lp64, lower=True):
    """(inv(Lp)ᵀ as a double-single pair, computed once on the host in
    f64).  Lp is the m×m Cholesky factor from
    :func:`..linalg.host_cholesky_f64`; the returned pair feeds
    :func:`ds_matmul` so L = C Lp⁻ᵀ becomes one extended-precision GEMM
    with no sequential triangular dependency on device."""
    import scipy.linalg as sla

    Lp64 = np.asarray(Lp64, dtype=np.float64)
    m = Lp64.shape[0]
    inv = sla.solve_triangular(Lp64, np.eye(m), lower=lower)
    return ds_from_f64(inv.T)


def whiten_with_hostf64(x, cov_func, xu, Lp64, block_rows=16384):
    """L = k(x, xu) Lp⁻ᵀ at f64-equivalent accuracy, on device.

    The full-capacity (``config.PRUNE_SINGULAR_LANDMARKS = False``) path:
    the landmark kernel was factorized once on the host in f64
    (:func:`..linalg.host_cholesky_f64`); its triangular inverse ships as
    a double-single pair and the row-chunked whitening runs as
    :func:`ds_matmul` — replacing the f32 TRSM whose error at extreme
    kernel conditioning capped the 98k-cell d=2 time-series fidelity at
    corr 0.76 (PERFORMANCE.md r3 disclosure).
    """
    B_hi, B_lo = host_triangular_inverse_ds(Lp64)
    try:
        spec, params = cov_func.operand_spec()
    except (NotImplementedError, AttributeError):
        spec = None
    n = x.shape[0]
    blocks = []
    for start in range(0, n, block_rows):
        xi = x[start : start + block_rows]
        if xi.shape[0] < block_rows and n > block_rows:
            xi = jnp.concatenate(
                [xi, jnp.zeros((block_rows - xi.shape[0], x.shape[1]), x.dtype)]
            )
        if spec is not None:
            from .kernels import eval_operand_spec

            C = eval_operand_spec(spec, params, xi, xu)
        else:
            C = cov_func(xi, xu)
        blocks.append(_ds_matmul_block(C, B_hi, B_lo))
    L = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=0)
    return L[:n]
