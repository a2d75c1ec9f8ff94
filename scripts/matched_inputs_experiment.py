"""Matched-inputs fidelity experiment at the 98k d=2 time-series shape.

The f64-vs-f64 seed-floor run measured corr 0.9987 between two equally
valid landmark selections — far ABOVE the TPU path's 0.911 vs the stored
f64 fit, falsifying the round-4 "input sensitivity" reading of the
residual gap.  What remains between the TPU fit and the f64 reference is
then (a) f32 pipeline INPUTS (k-means landmark positions, kNN
nn-distances, ls/mu heuristics — all previously computed with
reduced-precision matmul passes) and/or (b) f32 arithmetic in the
factorization + optimization.

This experiment isolates (b): inject the f64 prepare's intermediates
(landmarks, nn_distances, ls, mu, d — saved by seed_floor_experiment.py)
into the TPU f32 fit and compare against the f64 fit on the SAME inputs
(its log_density ships in the same npz).  Any gap left is pure
arithmetic; corr ~1 here plus corr ~1 on the default path means the
whole fidelity story is closed.

Run on TPU (axon env): python scripts/matched_inputs_experiment.py
"""

import time

from _common import jax, log  # noqa: F401

import jax.numpy as jnp
import numpy as np

NPZ = "/root/repo/benchdata/f64_prepare_time98k_seed43.npz"


def main():
    import mellon_tpu
    from accuracy_cert import named_x

    named = named_x("time_98192x2")
    assert named is not None, "stored 98k time-series data missing"
    x_np, t_np = named
    blob = np.load(NPZ)
    ld_ref = blob["log_density"].astype(np.float64)

    x = jnp.asarray(x_np, jnp.float32)
    t = jnp.asarray(t_np, jnp.float32)
    log(f"devices: {jax.devices()}  n={x.shape[0]:,} matched-inputs fit")

    est = mellon_tpu.TimeSensitiveDensityEstimator(
        ls_time=0.375,
        landmarks=jnp.asarray(blob["landmarks"], jnp.float32),
        nn_distances=jnp.asarray(blob["nn_distances"], jnp.float32),
        ls=float(blob["ls"]),
        mu=float(blob["mu"]),
        d=float(blob["d"]),
    )
    t0 = time.time()
    ld = np.asarray(est.fit_predict(x, t), dtype=np.float64)
    c = float(np.corrcoef(ld, ld_ref)[0, 1])
    rmse = float(np.sqrt(np.mean((ld - ld_ref) ** 2)) / (ld_ref.max() - ld_ref.min()))
    log(
        f"TPU f32 fit on the f64 prepare's inputs vs the f64 fit on the "
        f"same inputs: corr {c:.6f} rmse_frac {rmse:.6f} "
        f"[{time.time()-t0:.0f}s]"
    )
    log(
        "(pure-arithmetic isolation: inputs identical by construction; "
        "seed floor for CONTEXT: f64-vs-f64 different landmarks = 0.9987)"
    )


if __name__ == "__main__":
    main()
