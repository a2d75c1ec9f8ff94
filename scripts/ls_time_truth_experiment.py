"""Which ls_time is right when the host-f64 rescue engages — the batched
masked program or the per-time loop?

At the d=2 bench shape (every per-time kernel f32-singular) the two paths
disagree (19.6 vs 38.5).  This experiment builds a medium forced-rescue
configuration on CPU, computes the f64 per-time-loop estimate (the
reference's own numerics — ground truth), and compares both f32 paths
against it.  Run WITHOUT the axon env: `env -u PALLAS_AXON_POOL_IPS -u
JAX_PLATFORMS python scripts/ls_time_truth_experiment.py`.
"""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_GROUPS = 6
GROUP_LO, GROUP_HI = 450, 650
D = 2


def build_data():
    import jax
    import jax.numpy as jnp

    from bench import make_data

    rng = np.random.RandomState(0)
    sizes = rng.randint(GROUP_LO, GROUP_HI, size=N_GROUPS)
    n = int(sizes.sum())
    x = make_data(jax.random.PRNGKey(10), n, D)
    # quantize coordinates: duplicates make the per-time kernels
    # f32-singular, forcing the host-f64 rescue like the d=2 bench
    x = jnp.round(x * 8) / 8
    times = np.concatenate(
        [np.full(s, i, dtype=np.float32) for i, s in enumerate(sizes)]
    )
    xt = np.concatenate([np.asarray(x), times[:, None]], axis=1)
    return xt


def run_variant(xt, mode):
    """mode: 'f32_batched' | 'f32_loop' | 'f64_loop' — each in-process."""
    import jax

    if mode == "f64_loop":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import logging

    logging.getLogger("mellon_tpu").setLevel(logging.WARNING)

    from mellon_tpu.models import ls_time as lt
    from mellon_tpu.ops.kernels import Matern52
    from mellon_tpu.ops.neighbors import nn_distances

    dtype = jnp.float64 if mode == "f64_loop" else jnp.float32
    xtj = jnp.asarray(xt, dtype)
    nn = nn_distances(xtj[:, :-1])
    if mode.endswith("loop"):
        orig = lt._batched_ls_time_densities
        lt._batched_ls_time_densities = lambda *a, **k: None
        try:
            ls = lt.compute_ls_time(nn, xtj, Matern52)
        finally:
            lt._batched_ls_time_densities = orig
    else:
        ls = lt.compute_ls_time(nn, xtj, Matern52)
    return float(ls)


def main():
    xt = build_data()
    np.save("/tmp/ls_truth_data.npy", xt)
    results = {}
    for mode in ("f64_loop", "f32_loop", "f32_batched"):
        code = (
            "import sys, numpy as np; sys.path[:0]=[%r,%r]; "
            "import ls_time_truth_experiment as e; "
            "xt=np.load('/tmp/ls_truth_data.npy'); "
            "print('RESULT', %r, e.run_variant(xt, %r))"
            % (
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                os.path.dirname(os.path.abspath(__file__)),
                mode,
                mode,
            )
        )
        env = dict(os.environ)
        if mode == "f64_loop":
            # the ground-truth leg always runs the CPU-f64 pipeline, even
            # when the experiment is launched from the TPU campaign env
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env.pop("JAX_PLATFORMS", None)
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            env=env,
        )
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                results[mode] = float(line.split()[-1])
        if mode not in results:
            print(f"{mode} FAILED:\n{r.stdout[-800:]}\n{r.stderr[-800:]}")
    print("ls_time estimates:", results)
    if "f64_loop" in results:
        truth = results["f64_loop"]
        for mode in ("f32_loop", "f32_batched"):
            if mode in results:
                rel = abs(results[mode] - truth) / abs(truth)
                print(f"{mode}: rel err vs f64 truth = {rel:.4f}")


if __name__ == "__main__":
    main()
