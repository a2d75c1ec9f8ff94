"""Why does the 98k time-series cert show corr 0.72 vs host-f64?

Hypothesis: at d=2 the product kernel over 5,000 landmarks is f32-rank
~2,048, so the f32 path prunes 5,000 -> 2,048 landmarks while the f64
reference keeps all 5,000 — a genuine capacity difference that
oversmooths the density field.  This experiment reproduces the setup at
quarter scale (24,576 cells) and compares, against an f64 reference fit:

  (a) the default f32 path (pivoted pruning), and
  (b) an f32 path with pruning disabled (host-f64 Cholesky of the FULL
      landmark kernel, all 5,000 landmarks kept).

Run WITHOUT the axon env:
  env -u PALLAS_AXON_POOL_IPS -u JAX_PLATFORMS python scripts/time_cert_experiment.py
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

N, D, T = 24_576, 2, 8


def build():
    import jax

    from time_bench import make_time_data

    x, t = make_time_data(jax.random.PRNGKey(1), N, D, T)
    np.save("/tmp/tc_x.npy", np.asarray(x, dtype=np.float32))
    np.save("/tmp/tc_t.npy", np.asarray(t, dtype=np.float32))


def run_variant(mode):
    import jax

    if mode == "f64":
        jax.config.update("jax_enable_x64", True)
    import logging

    import jax.numpy as jnp

    logging.getLogger("mellon_tpu").setLevel(logging.WARNING)
    import mellon_tpu

    dtype = jnp.float64 if mode == "f64" else jnp.float32
    x = jnp.asarray(np.load("/tmp/tc_x.npy"), dtype)
    t = jnp.asarray(np.load("/tmp/tc_t.npy"), dtype)

    if mode == "f32_noprune":
        # keep ALL landmarks: replace the pruning branch with a host-f64
        # factorization of the full landmark kernel
        from mellon_tpu.models import fused
        from mellon_tpu.models.base import BaseEstimator
        from mellon_tpu.ops.linalg import safe_cholesky

        fused.ENABLED = False

        def no_prune(self, K, L, ok):
            if bool(ok):
                return L
            return safe_cholesky(K, jitter=self.jitter, max_tries=3)

        BaseEstimator._lp_accept_or_prune = no_prune

    est = mellon_tpu.TimeSensitiveDensityEstimator(ls_time=0.375)
    ld = est.fit_predict(x, t)
    np.save(f"/tmp/tc_ld_{mode}.npy", np.asarray(ld, dtype=np.float64))
    print(f"RESULT {mode} done; L rank {est.L.shape[1]}")


def main():
    build()
    for mode in ("f64", "f32_default", "f32_noprune"):
        code = (
            "import sys; sys.path[:0]=[%r,%r]; "
            "import time_cert_experiment as e; e.run_variant(%r)"
            % (REPO, os.path.join(REPO, "scripts"), mode)
        )
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True
        )
        out = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        print(out[-1] if out else f"{mode} FAILED:\n{r.stdout[-500:]}\n{r.stderr[-800:]}")
    ref = np.load("/tmp/tc_ld_f64.npy")
    for mode in ("f32_default", "f32_noprune"):
        path = f"/tmp/tc_ld_{mode}.npy"
        if not os.path.exists(path):
            continue
        ld = np.load(path)
        c = np.corrcoef(ld, ref)[0, 1]
        rmse = np.sqrt(np.mean((ld - ref) ** 2)) / (ref.max() - ref.min())
        print(f"{mode}: corr {c:.6f}  rmse_frac {rmse:.6f}")


if __name__ == "__main__":
    main()
