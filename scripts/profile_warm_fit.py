"""Warm per-stage profile of the real DensityEstimator fit path.

Unlike ``profile_stages.py`` (which times the raw ops cold, including
program loads), this drives the actual estimator twice on identically
shaped data and reports the second (steady-state) fit broken down by
lazily prepared attribute — the numbers that make up the ``bench.py``
headline.  Development tool; prints one line per stage.
"""

import time

from _common import jax, log  # noqa: F401  (repo path + compile cache)



ATTRS = [
    "n_landmarks",
    "rank",
    "gp_type",
    "nn_distances",
    "d",
    "mu",
    "ls",
    "cov_func",
    "landmarks",
    "Lp",
    "L",
    "initial_value",
    "transform",
    "loss_func",
]


def timed_fit(est, x, label):
    import jax

    t_total = time.time()
    est.set_x(x)
    stages = []
    for attr in ATTRS:
        t0 = time.time()
        est._prepare_attribute(attr)
        val = getattr(est, attr, None)
        if hasattr(val, "block_until_ready"):
            val.block_until_ready()
        else:
            jax.effects_barrier()
        stages.append((attr, time.time() - t0))
    t0 = time.time()
    est.validate_parameter() if hasattr(est, "validate_parameter") else None
    est.run_inference()
    jax.effects_barrier()
    stages.append(("run_inference (L-BFGS)", time.time() - t0))
    t0 = time.time()
    # build_predict=False matches the headline path: bench.py goes through
    # fit_predict, which skips predictor construction
    est.process_inference(build_predict=False)
    est.log_density_x.block_until_ready()
    stages.append(("process_inference", time.time() - t0))
    total = time.time() - t_total
    log(f"--- {label}: total {total:.3f}s ---")
    for name, t in sorted(stages, key=lambda s: -s[1]):
        if t > 0.001:
            log(f"  {name:<28s} {t:>8.3f}s {100 * t / total:>5.1f}%")
    return total


def main(n=8627, d=20):
    from bench import make_data

    import mellon_tpu

    log(f"devices: {jax.devices()}")
    x_warm = make_data(jax.random.PRNGKey(7), n, d)
    x = make_data(jax.random.PRNGKey(42), n, d)
    x_warm.block_until_ready()
    x.block_until_ready()

    timed_fit(mellon_tpu.DensityEstimator(), x_warm, "cold fit (program loads)")
    timed_fit(mellon_tpu.DensityEstimator(), x, "warm fit (steady state)")
    # a third fit on the warm data again: confirms zero-retrace steady state
    timed_fit(mellon_tpu.DensityEstimator(), x_warm, "warm fit repeat")

    # whole-path timing through the public API (exercises the fused prepare,
    # which the per-attribute loop above bypasses) — this is what bench.py
    # measures
    for label, data in (("fit_predict warmup", x_warm), ("fit_predict warm", x)):
        t0 = time.time()
        ld = mellon_tpu.DensityEstimator().fit_predict(data)
        ld.block_until_ready()
        log(f"{label}: {time.time()-t0:.3f}s")


if __name__ == "__main__":
    main()
