"""Predictor (serving-path) throughput: the deployed-artifact flow of
SURVEY.md §3.3 — evaluate a fitted density predictor at out-of-sample
query points, warm, on the current accelerator.

Measures the conditional mean (the fused spec-keyed program), covariance
and uncertainty variants, and a large chunked query (200k rows).  The
reference's corresponding numbers are the basic-tutorial predictor cells
(BASELINE.md: 2.71 s for gradient+hessian at 8,627 points; plain
prediction is ~0.5 s there).

Usage: python scripts/predict_bench.py
"""

import time

from _common import jax, log  # noqa: F401  (repo path + compile cache)

import jax.numpy as jnp


def timed(fn, *args):
    """Second (warm) wall time of fn."""
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.time() - t0


def main():
    from bench import make_data

    import mellon_tpu

    log(f"devices: {jax.devices()}")
    n, d = 8627, 20
    x = make_data(jax.random.PRNGKey(0), n, d)
    est = mellon_tpu.DensityEstimator(predictor_with_uncertainty=True)
    est.fit(x)
    pred = est.predict

    q = make_data(jax.random.PRNGKey(1), n, d)
    t_mean = timed(pred, q)
    log(f"mean @ {n:,} rows: {t_mean * 1e3:.1f} ms "
        f"({n / t_mean:,.0f} rows/s)")

    t_cov = timed(lambda a: pred.covariance(a, diag=True), q)
    t_unc = timed(pred.uncertainty, q)
    log(f"covariance(diag) @ {n:,}: {t_cov * 1e3:.1f} ms   "
        f"uncertainty @ {n:,}: {t_unc * 1e3:.1f} ms")

    t_grad = timed(pred.gradient, q)
    log(f"gradient @ {n:,}: {t_grad * 1e3:.1f} ms")

    nq = 200_000
    big = make_data(jax.random.PRNGKey(2), nq, d)
    t_big = timed(pred, big)
    log(f"mean @ {nq:,} rows (chunked): {t_big:.3f} s "
        f"({nq / t_big:,.0f} rows/s)")


if __name__ == "__main__":
    main()
