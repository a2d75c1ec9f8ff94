"""Per-stage breakdown of the fused sparse_nystroem warm fit at the
baseline-matrix shape (8,627 x 20, m=2000, rank=0.999) — locates the cost
that keeps the row below the 5x bar (suspects: TPU QDWH eigh and
Householder QR inside the randomized eigensolver).

Usage: python scripts/profile_nystroem.py
"""

import time

from _common import jax, log  # noqa: F401  (repo path + compile cache)

import jax.numpy as jnp


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    log(f"{name}: {min(times)*1e3:.1f} ms (min of {reps})")
    return out


def main():
    from bench import make_data
    from mellon_tpu.models.fused import (
        DEFAULT_ASSIGN_BLOCK,
        DEFAULT_BATCH_SIZE,
        _fused_sparse_prepare_program,
    )
    from mellon_tpu.ops.linalg import (
        _eigendecomposition,
        _fused_nystroem_core,
        _nystroem_final,
        randomized_eigh,
    )

    log(f"devices: {jax.devices()}")
    n, d, k = 8627, 20, 2000
    x = make_data(jax.random.PRNGKey(1), n, d)
    x.block_until_ready()
    spec = ("matern52", None, 1)
    key = jax.random.PRNGKey(42)

    out = timed(
        "stage1 (kNN+heuristics+kmeans+K)",
        lambda: _fused_sparse_prepare_program(
            x, key, 1e-6, 1.0, spec, k, d, None,
            int(min(DEFAULT_BATCH_SIZE, n)), int(min(DEFAULT_ASSIGN_BLOCK, n)),
        ),
    )
    nn, *_rest = out
    ls = out[6]
    xu, K = out[7], out[8]
    ls_f = float(ls)

    core = timed(
        "nystroem core (C+W+sketch+proj)",
        lambda: _fused_nystroem_core(
            x, xu, K, jnp.asarray(1e-6, K.dtype), (ls_f,), spec, 512
        ),
    )
    C, vs, proj = core

    # inner suspects, isolated
    W = K + 1e-6 * jnp.eye(K.shape[0], dtype=K.dtype)
    timed("randomized_eigh(W, 512) [3 QRs + eigh528]",
          lambda: randomized_eigh(W, 512))
    omega = jax.random.normal(jax.random.PRNGKey(0), (k, 528), dtype=K.dtype)
    timed("one W @ omega product",
          jax.jit(lambda A, B: jnp.matmul(A, B, precision=jax.lax.Precision.HIGHEST)),
          W, omega)
    timed("one QR(2000x528)", jax.jit(lambda A: jnp.linalg.qr(A)[0]), W @ omega)
    timed("one eigh(528x528)", jax.jit(jnp.linalg.eigh), proj)

    t0 = time.time()
    S, U, raw_p = _eigendecomposition(proj, rank=0.999, with_raw_rank=True)
    log(f"_eigendecomposition(proj) incl. host syncs: "
        f"{(time.time()-t0)*1e3:.1f} ms (first call)")
    t0 = time.time()
    S, U, raw_p = _eigendecomposition(proj, rank=0.999, with_raw_rank=True)
    log(f"_eigendecomposition(proj) incl. host syncs: "
        f"{(time.time()-t0)*1e3:.1f} ms (warm)")

    timed("final factor C @ (vs U)", _nystroem_final, C, vs, U)

    # end-to-end fused fit for the same shape, for cross-checking the sum
    import mellon_tpu

    def fit(seed):
        est = mellon_tpu.DensityEstimator(
            gp_type="sparse_nystroem", rank=0.999, n_landmarks=k
        )
        est.fit_predict(make_data(jax.random.PRNGKey(seed), n, d))

    t0 = time.time()
    fit(5)
    log(f"fit_predict cold-ish: {time.time()-t0:.1f}s")
    t0 = time.time()
    fit(6)
    log(f"fit_predict warm: {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
