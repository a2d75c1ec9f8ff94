"""f64-CPU BATCHED ls_time at the d=2 bench shape.

Round-4 arbiter: the f64 per-time LOOP gives 24.52 on this dataset while
TPU-f32 batched gives 19.55 and TPU-f32 loop gives 38.52 — and routing
the rescued groups' predict through extended precision changes the
batched value not at all (bit-identical 19.552), so the predict solve is
NOT the drift source.  This run separates the remaining hypotheses:

  f64 batched ≈ 24.5  -> the batched PROCEDURE is exact; the drift is the
                         f32 fits/inputs themselves (input-sensitivity
                         class, same as the 98k fidelity story);
  f64 batched ≈ 19.5  -> the masked/padded batched procedure itself
                         diverges from the per-time loop at this shape.

Run on CPU: env -u PALLAS_AXON_POOL_IPS -u JAX_PLATFORMS python ...
"""

from _common import jax, log  # noqa: F401

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from ls_time_bench import make_ragged_time_data
    from mellon_tpu.models.ls_time import compute_ls_time
    from mellon_tpu.ops.kernels import Matern52
    from mellon_tpu.ops.neighbors import nn_distances

    rng = np.random.RandomState(0)
    sizes = rng.randint(1700, 2500, size=10)
    x = make_ragged_time_data(jax.random.PRNGKey(10), 2, sizes)
    x = jnp.asarray(np.asarray(x), jnp.float64)
    log(f"devices: {jax.devices()}  dtype={x.dtype}")
    nn = nn_distances(x[:, :-1])
    ls = compute_ls_time(nn, x, Matern52)
    log(f"f64 BATCHED ls_time at the d=2 bench shape: {float(ls):.4f} "
        "(f64 loop truth: 24.52; TPU-f32 batched: 19.55)")


if __name__ == "__main__":
    main()
