"""Cell-state density estimation, start to finish.

Runnable port of the reference's ``notebooks/basic_tutorial.ipynb`` flow
(density fit on a cell-state embedding → predictor → serialization →
out-of-sample evaluation) with a synthetic embedding standing in for the
tutorial's T-cell-depleted bone-marrow diffusion-map eigenvectors, so it
runs anywhere without downloads.

Usage: python examples/basic_tutorial.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mellon_tpu as mellon

# --- synthetic stand-in for ad.obsm["DM_EigenVectors"] ----------------------
# three cell populations with different densities in a 10-dim state space
rs = np.random.RandomState(0)
populations = [
    rs.randn(4000, 10) * 0.3,                       # dense population
    rs.randn(1500, 10) * 0.6 + 2.0,                 # looser population
    rs.randn(500, 10) * 1.0 - 2.0,                  # rare population
]
X = jnp.asarray(np.concatenate(populations), dtype=jnp.float32)

# --- fit the density model (all defaults, like the tutorial) ----------------
model = mellon.DensityEstimator()
log_density = model.fit_predict(X)
print(f"fit {X.shape[0]:,} cells; log-density range "
      f"[{float(log_density.min()):.2f}, {float(log_density.max()):.2f}]")

# denser populations should score higher
d_dense = float(jnp.mean(log_density[:4000]))
d_rare = float(jnp.mean(log_density[-500:]))
print(f"mean log-density: dense pop {d_dense:.2f} > rare pop {d_rare:.2f}")
assert d_dense > d_rare

# --- the predictor is the deployable artifact --------------------------------
predictor = model.predict

# embed in an AnnData-style dict (ad.uns["log_density_function"] in the
# tutorial) and reconstitute
state = predictor.to_dict()
restored = mellon.Predictor.from_dict(state)
assert np.allclose(np.asarray(restored(X)), np.asarray(predictor(X)), atol=1e-6)
# the predictor's conditional mean matches the training log-densities to
# f32 conditioning accuracy
assert np.allclose(np.asarray(restored(X)), np.asarray(log_density), atol=1e-2)
print("to_dict/from_dict roundtrip: identical predictions")

# JSON file serialization (+gzip), evaluable on out-of-sample states
predictor.to_json("/tmp/density_predictor.json.gz", compress="gzip")
loaded = mellon.Predictor.from_json("/tmp/density_predictor.json.gz")
X_new = jnp.asarray(rs.randn(100, 10) * 0.3, dtype=jnp.float32)
print(f"out-of-sample mean log-density: {float(loaded(X_new).mean()):.2f}")

# gradients of the density field (e.g. for density-directed trajectories)
grads = predictor.gradient(X_new)
print(f"density gradient shape: {grads.shape}")

# --- uncertainty-aware variant (ADVI + predictor_with_uncertainty) -----------
model_u = mellon.DensityEstimator(
    optimizer="advi", predictor_with_uncertainty=True, n_landmarks=500
)
model_u.fit(X)
unc = model_u.predict.uncertainty(X_new)
print(f"posterior uncertainty at new states: mean {float(unc.mean()):.4f}")
print("basic tutorial flow complete")
