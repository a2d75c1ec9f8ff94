"""Atlas-scale density fit: 1M cells × 50 dims (BASELINE.json config 5's
single-chip slice).

Exercises the scale path end-to-end on one chip: streaming exact kNN
(column-blocked), subsampled k-means landmarks, pivoted-Cholesky landmark
pruning, the n×r sparse factorization, and the compiled L-BFGS MAP.

Usage: python scripts/atlas_bench.py [n] [d] [m]
"""

import sys
import time

from _common import jax, log  # noqa: F401  (repo path + compile cache)

import jax.numpy as jnp



def main(n=1_000_000, d=50, m=5_000):
    from bench import make_data
    import mellon_tpu

    log(f"devices: {jax.devices()}  n={n:,} d={d} m={m:,}")
    key = jax.random.PRNGKey(0)
    x = make_data(key, n, d)
    x.block_until_ready()
    log("data ready")

    est = mellon_tpu.DensityEstimator(n_landmarks=m)
    t0 = time.time()
    est.prepare_inference(x)
    jax.device_get(est.initial_value[:1])
    t_prep = time.time() - t0
    log(
        f"prepare_inference: {t_prep:.1f}s "
        f"(effective landmarks {est.n_landmarks:,}, L {tuple(est.L.shape)})"
    )

    t0 = time.time()
    est.run_inference()
    jax.device_get(est.pre_transformation[:1])
    t_opt = time.time() - t0
    log(f"run_inference (L-BFGS): {t_opt:.1f}s loss={est.losses[-1]:.6g}")

    t0 = time.time()
    ld = est.process_inference(build_predict=False)
    jax.device_get(ld[:1])
    t_post = time.time() - t0
    log(f"process_inference: {t_post:.1f}s")
    log(
        f"TOTAL fit: {t_prep + t_opt + t_post:.1f}s for {n:,} cells "
        f"(finite: {bool(jnp.all(jnp.isfinite(ld)))})"
    )

    # a second fit on fresh same-shape data: the steady-state per-fit cost
    # (program loads/compiles amortized away)
    x2 = make_data(jax.random.PRNGKey(1), n, d)
    x2.block_until_ready()
    est2 = mellon_tpu.DensityEstimator(n_landmarks=m)
    t0 = time.time()
    ld2 = est2.fit_predict(x2)
    ld2.block_until_ready()
    log(f"WARM fit_predict: {time.time() - t0:.1f}s for {n:,} cells")

    # opt-in: bf16-coarse + f32-polish MAP (precision="bf16"); report its
    # warm time and agreement with the f32 fit on the same data
    est3 = mellon_tpu.DensityEstimator(n_landmarks=m, precision="bf16")
    ld3 = est3.fit_predict(x2)  # warm the two-phase programs
    x3 = make_data(jax.random.PRNGKey(2), n, d)
    x3.block_until_ready()
    est3 = mellon_tpu.DensityEstimator(n_landmarks=m, precision="bf16")
    t0 = time.time()
    ld3 = est3.fit_predict(x3)
    ld3.block_until_ready()
    t_bf16 = time.time() - t0
    est4 = mellon_tpu.DensityEstimator(n_landmarks=m)
    ld4 = est4.fit_predict(x3)
    corr = float(jnp.corrcoef(ld3, ld4)[0, 1])
    log(
        f"WARM fit_predict precision='bf16': {t_bf16:.1f}s "
        f"(log-density corr vs f32 fit: {corr:.5f})"
    )

    # subscale accuracy certificate (50k x 50): the full 1M host-f64
    # reference fit is out of this container's budget, so the certificate
    # pins the SAME pruned-factorization numerics at 50k against a host-f64
    # full-landmark fit (scripts/accuracy_cert.py --write-named)
    from accuracy_cert import compare_named, named_x

    named = named_x("atlas_sub_50000x50")
    if named is not None:
        xc, _ = named
        estc = mellon_tpu.DensityEstimator(n_landmarks=5000)
        ldc = estc.fit_predict(jnp.asarray(xc))
        log(
            "50k-subscale accuracy vs host-f64: "
            f"{compare_named('atlas_sub_50000x50', ldc)}"
        )


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
