"""Round-4 fidelity experiment (VERDICT r3 Missing #2): is L-CONSTRUCTION
precision or f32 OPTIMIZATION the binding limit at the 98k-cell d=2
time-series tutorial shape?

Round-3 evidence: the default f32 path (pivot-pruned) certifies corr 0.723
vs host-f64; PRUNE_SINGULAR_LANDMARKS=False (host-f64 FACTOR + f32 chunked
TRSM) reaches only 0.760.  Nobody ran the fully-host-f64 L: factor AND
TRSM (and the cross-covariance evaluation) in f64, f32 cast only at the
end, with everything from the optimizer onward staying f32 on TPU.

Modes measured against the stored host-f64 reference fit
(benchdata/ref_time_98192x2_f64.npz):

  A. no-prune f32 TRSM       — reproduces the r3 [b3b6c16] result.
  B. host-f64 L, f32 rest    — THE experiment: if corr recovers, the f32
                               triangular solve was the binding limit and a
                               double-single device TRSM is worth building;
                               if not, f32 optimization is the limit.
  C. B + host-f64 serving    — predictor mean recomputed on the host in
                               f64 (weights = Lp64^-T z*, mean = K64 w)
                               to separate serving-path f32 error from
                               fit error.

Run in the TPU env; host parts are numpy/f64 on the CPU.
"""

import os
import sys
import time

from _common import jax, log  # noqa: F401  (repo path + compile cache)

import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHUNK = 8192


def matern52_f64(X, Y, ls):
    """numpy-f64 replica of ops/kernels._matern52_vals (incl. the 1e-12
    epsilon inside the distance sqrt, mellon/util.py:351-366 parity)."""
    xx = np.sum(X * X, axis=1)[:, None]
    yy = np.sum(Y * Y, axis=1)[None, :]
    sq = xx - 2.0 * (X @ Y.T) + yy + 1e-12
    r = np.sqrt(5.0) * np.sqrt(np.maximum(sq, 1e-12)) / ls
    return (r + r * r / 3.0 + 1.0) * np.exp(-r)


def product_kernel_f64(X, Y, ls, ls_time):
    """Space x time Matern52 product kernel on the concatenated
    [state, time] coordinates (parity: mellon/parameters.py:641-645)."""
    return matern52_f64(X[:, :-1], Y[:, :-1], ls) * matern52_f64(
        X[:, -1:], Y[:, -1:], ls_time
    )


def corr_rmse(ld, ref):
    ld = np.asarray(ld, dtype=np.float64)
    c = float(np.corrcoef(ld, ref)[0, 1])
    rmse = float(np.sqrt(np.mean((ld - ref) ** 2)) / (ref.max() - ref.min()))
    return c, rmse


def main(smoke=False):
    import mellon_tpu
    from mellon_tpu import config
    from mellon_tpu.ops.linalg import host_cholesky_f64
    from accuracy_cert import named_path, named_x

    import scipy.linalg as sla

    if smoke:
        # mechanics-only dry run on tiny synthetic data: the "reference" is
        # the default f32 fit itself, so every corr should be ~1
        from time_bench import make_time_data

        xs, ts = make_time_data(jax.random.PRNGKey(0), 2000, 2, 4)
        x_np, t_np = np.asarray(xs), np.asarray(ts)
        ref = np.asarray(
            mellon_tpu.TimeSensitiveDensityEstimator(
                ls_time=0.375, n_landmarks=500
            ).fit_predict(xs, ts),
            dtype=np.float64,
        )
    else:
        named = named_x("time_98192x2")
        assert named is not None, "run accuracy_cert.py --write-named first"
        x_np, t_np = named
        ref = np.load(named_path("time_98192x2"))["log_density"].astype(
            np.float64
        )
    x = jnp.asarray(x_np, jnp.float32)
    t = jnp.asarray(t_np, jnp.float32)
    log(f"devices: {jax.devices()}  n={x.shape[0]:,} d={x.shape[1]}")

    # ---- mode A: full capacity, host-f64 factor, f32 TRSM ------------------
    config.PRUNE_SINGULAR_LANDMARKS = False
    t0 = time.time()
    kwargs = dict(n_landmarks=500) if smoke else {}
    estA = mellon_tpu.TimeSensitiveDensityEstimator(ls_time=0.375, **kwargs)
    ldA = estA.fit_predict(x, t)
    cA, rA = corr_rmse(jax.device_get(ldA), ref)
    log(
        f"A (no-prune, f32 TRSM): corr {cA:.6f} rmse_frac {rA:.6f} "
        f"[{time.time()-t0:.0f}s]  (r3 [b3b6c16] measured 0.760)"
    )
    ld_trA = np.asarray(jax.device_get(estA.transform(estA.pre_transformation)))
    cAt, rAt = corr_rmse(ld_trA, ref)
    log(f"A transform-level: corr {cAt:.6f} rmse_frac {rAt:.6f}")

    # ---- host-f64 L construction -------------------------------------------
    t0 = time.time()
    ls = float(estA.ls)
    ls_time = float(estA.ls_time)
    jitter = float(estA.jitter)
    xu64 = np.asarray(jax.device_get(estA.landmarks), dtype=np.float64)
    # full [state, time] training coordinates exactly as the estimator
    # concatenated them
    X64 = np.asarray(jax.device_get(estA.x), dtype=np.float64)
    m = xu64.shape[0]
    n = X64.shape[0]
    log(f"building host-f64 L: n={n:,} m={m:,} ls={ls:.4f} ls_time={ls_time}")

    K64 = product_kernel_f64(xu64, xu64, ls, ls_time)
    Lp64 = host_cholesky_f64(K64, jitter=jitter)
    log(f"host-f64 landmark Cholesky done [{time.time()-t0:.0f}s]")

    L64 = np.empty((n, m), dtype=np.float64)
    for s in range(0, n, CHUNK):
        e = min(s + CHUNK, n)
        C = product_kernel_f64(X64[s:e], xu64, ls, ls_time)
        L64[s:e] = sla.solve_triangular(Lp64, C.T, lower=True).T
    log(f"host-f64 chunked TRSM done [{time.time()-t0:.0f}s]")

    # ---- mode B: inject the f64-built (f32-cast) L, f32 from there on ------
    t0 = time.time()
    estB = mellon_tpu.TimeSensitiveDensityEstimator(ls_time=ls_time, **kwargs)
    # warm-resume attribute injection (SURVEY.md section 5.4): the lazy
    # protocol skips every preset attribute, so only ridge warm start,
    # L-BFGS and serving run — all f32 on device
    for attr in ("nn_distances", "d", "mu", "ls", "cov_func", "landmarks"):
        setattr(estB, attr, getattr(estA, attr))
    estB.Lp = jnp.asarray(Lp64, jnp.float32)
    estB.L = jnp.asarray(L64, jnp.float32)
    ldB = estB.fit_predict(x, t)
    cB, rB = corr_rmse(jax.device_get(ldB), ref)
    log(
        f"B (host-f64 L, f32 optimizer+serving): corr {cB:.6f} "
        f"rmse_frac {rB:.6f} [{time.time()-t0:.0f}s]"
    )
    ld_trB = np.asarray(jax.device_get(estB.transform(estB.pre_transformation)))
    cBt, rBt = corr_rmse(ld_trB, ref)
    log(f"B transform-level (L64 z* + mu, f32): corr {cBt:.6f} rmse_frac {rBt:.6f}")

    # transform in f64 on host (isolates the f32 cast of L / the f32 matvec)
    z64 = np.asarray(jax.device_get(estB.pre_transformation), dtype=np.float64)
    mu = float(estB.mu)
    ld_tr64 = L64 @ z64 + mu
    cB64, rB64 = corr_rmse(ld_tr64, ref)
    log(f"B transform-level (f64 matvec): corr {cB64:.6f} rmse_frac {rB64:.6f}")

    # ---- mode C: host-f64 serving of B's MAP -------------------------------
    t0 = time.time()
    w64 = sla.solve_triangular(Lp64.T, z64, lower=False)
    ldC = np.empty(n, dtype=np.float64)
    for s in range(0, n, CHUNK):
        e = min(s + CHUNK, n)
        C = product_kernel_f64(X64[s:e], xu64, ls, ls_time)
        ldC[s:e] = C @ w64 + mu
    cC, rC = corr_rmse(ldC, ref)
    log(
        f"C (host-f64 serving of B's MAP): corr {cC:.6f} rmse_frac {rC:.6f} "
        f"[{time.time()-t0:.0f}s]"
    )

    log(
        "VERDICT: "
        + (
            "L-construction precision was the binding limit (B recovers); "
            "a double-single device TRSM closes the gap on-device."
            if cB >= 0.99
            else (
                "host-f64 L alone does NOT recover fidelity — the f32 "
                "optimization/serving path is (also) binding."
            )
        )
    )


if __name__ == "__main__":
    sys.exit(main(smoke="smoke" in sys.argv[1:]))
