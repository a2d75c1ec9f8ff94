"""f64-vs-f64 seed floor at the 98k d=2 time-series tutorial shape.

Round-4 context: with the FULLY-f64 L (and f64 serving) the TPU-pipeline
fit reaches corr 0.911 against the stored host-f64 reference — so the
residual gap cannot be arithmetic downstream of L.  The remaining
candidates are legitimate pipeline-input differences (k-means landmark
positions, approximate-vs-exact kNN) to which the model is genuinely
sensitive at this degenerate kernel conditioning.

This experiment bounds that sensitivity with reference numerics alone:
the SAME CPU-f64 pipeline, fit on the SAME data, with a different
k-means seed.  The corr between the two f64 fits is the ceiling any
arithmetic can be held to — if it is ~0.91 too, the f32/TPU fit is
within the model's own seed sensitivity and the "within MC error"
acceptance bar must be read against THIS floor, not against corr = 1.

Run on the CPU backend:
  env -u PALLAS_AXON_POOL_IPS -u JAX_PLATFORMS python seed_floor_experiment.py
"""

import sys
import time

from _common import log

import numpy as np


def main(seed=43):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import mellon_tpu
    from accuracy_cert import named_path, named_x

    named = named_x("time_98192x2")
    assert named is not None
    x_np, t_np = named
    ref = np.load(named_path("time_98192x2"))["log_density"].astype(np.float64)

    x = jnp.asarray(x_np, jnp.float64)
    t = jnp.asarray(t_np, jnp.float64)
    log(f"devices: {jax.devices()}  n={x.shape[0]:,} (f64 CPU pipeline)")

    t0 = time.time()
    est = mellon_tpu.TimeSensitiveDensityEstimator(
        ls_time=0.375, random_state=seed
    )
    ld = est.fit_predict(x, t)
    # persist the f64 prepare's intermediates: a matched-inputs TPU fit
    # (landmarks/nn/ls injected) isolates "f32 heuristic inputs" from
    # "f32 arithmetic" if the seed floor turns out to be tight
    np.savez_compressed(
        f"/root/repo/benchdata/f64_prepare_time98k_seed{seed}.npz",
        landmarks=np.asarray(est.landmarks, np.float64),
        nn_distances=np.asarray(est.nn_distances, np.float64),
        ls=np.float64(est.ls),
        mu=np.float64(est.mu),
        d=np.float64(est.d),
        log_density=np.asarray(ld, np.float64),
    )
    ld = np.asarray(ld, dtype=np.float64)
    c = float(np.corrcoef(ld, ref)[0, 1])
    rmse = float(np.sqrt(np.mean((ld - ref) ** 2)) / (ref.max() - ref.min()))
    log(
        f"f64 fit with random_state={seed} vs stored f64 fit "
        f"(random_state=42): corr {c:.6f} rmse_frac {rmse:.6f} "
        f"[{time.time()-t0:.0f}s]"
    )
    log(
        "SEED FLOOR: any arithmetic can only be held to this corr at this "
        "shape — the model itself moves this much under an equally-valid "
        "landmark selection."
    )


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
