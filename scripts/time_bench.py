"""TimeSensitiveDensityEstimator benchmark at the reference's time-series
tutorial scale: ~98k cells, low-dim state space, ls_time given (the
reference measured 3 min 59 s on CPU for this configuration —
BASELINE.md / notebooks/time-series_tutorial.ipynb cell 10).

Methodology mirrors bench.py: one warmup fit on identically-shaped data
loads every program, then the measured fit runs warm.

Usage: python scripts/time_bench.py [n] [d] [n_times]
"""

import sys
import time

from _common import jax, log  # noqa: F401  (repo path + compile cache)

import jax.numpy as jnp



def make_time_data(key, n, d, n_times):
    """Clustered states drifting over n_times equally-populated stages."""
    from bench import make_data

    x = make_data(key, n, d)
    # equal-count time assignment keeps shapes identical across datasets
    times = jnp.arange(n, dtype=jnp.float32) % n_times
    drift = 0.25 * times[:, None] / n_times
    return x + drift, times


def one_fit(seed, n, d, n_times):
    import mellon_tpu

    x, times = make_time_data(jax.random.PRNGKey(seed), n, d, n_times)
    x.block_until_ready()
    t0 = time.time()
    est = mellon_tpu.TimeSensitiveDensityEstimator(ls_time=0.375)
    ld = est.fit_predict(x, times)
    jax.device_get(ld[:1])
    dt = time.time() - t0
    assert bool(jnp.all(jnp.isfinite(ld))), "non-finite density"
    # predictor evaluation at one time point (tutorial cell 12: 26.4 s).
    # First call on a fresh predictor traces+loads its program; measure the
    # second (steady-state) call like every other number in this file.
    dens = est.predict(x, time=0.0)
    jax.device_get(dens[:1])
    t0 = time.time()
    dens = est.predict(x, time=0.25)
    jax.device_get(dens[:1])
    dt_pred = time.time() - t0
    # time derivative (tutorial cell 14: 8.68 s).  First call on a fresh
    # predictor traces+loads its derivative program (per-predictor, since
    # the predictor state is baked into the closure); the second call is
    # the steady-state cost.
    t0 = time.time()
    td = est.predict.time_derivative(x, time=0.0)
    jax.device_get(td[:1])
    dt_td_first = time.time() - t0
    t0 = time.time()
    td = est.predict.time_derivative(x, time=0.5)
    jax.device_get(td[:1])
    dt_td = time.time() - t0
    return dt, dt_pred, (dt_td_first, dt_td)


def main(n=98_192, d=2, n_times=8):
    log(f"devices: {jax.devices()}  n={n:,} d={d} n_times={n_times}")
    one_fit(0, n, d, n_times)
    log("warmup fit done")
    dt, dt_pred, (dt_td_first, dt_td) = one_fit(1, n, d, n_times)
    log(
        f"warm fit: {dt:.2f}s (reference: 239 s)   "
        f"predict@t: {dt_pred:.2f}s (ref 26.4 s)   "
        f"time_derivative: first {dt_td_first:.2f}s / steady {dt_td:.2f}s "
        f"(ref 8.68 s)"
    )
    # the warmup fit's kernel may take a different factorization route
    # (e.g. no pruning) than the measured fits, in which case the first
    # measured fit pays the prune-route program loads — a second measured
    # fit on fresh same-shape data is the honest steady state
    dt2, dt_pred2, _ = one_fit(2, n, d, n_times)
    log(
        f"steady-state fit (3rd run, fresh data): {dt2:.2f}s   "
        f"predict@t: {dt_pred2:.2f}s"
    )

    # accuracy certificate: f32 fit on the stored data vs host-f64
    # reference (scripts/accuracy_cert.py --write-named)
    from accuracy_cert import compare_named, named_x

    named = named_x("time_98192x2")
    if named is not None and (n, d) == (98_192, 2):
        import mellon_tpu

        xc, tc = named
        estc = mellon_tpu.TimeSensitiveDensityEstimator(ls_time=0.375)
        ldc = estc.fit_predict(jnp.asarray(xc), jnp.asarray(tc))
        log(f"accuracy vs host-f64: {compare_named('time_98192x2', ldc)}")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
