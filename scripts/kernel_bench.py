"""Micro-benchmarks of the hot compute tiles on the current accelerator:

1. Matern-5/2 cross-covariance k(X, Y): Pallas fused tile vs XLA composition.
2. density log-prob gradient throughput: f32 L vs bf16-storage L.
"""

import sys
import time

from _common import jax, log  # noqa: F401  (repo path + compile cache)

import jax.numpy as jnp



def time_fn(fn, *args, reps=20):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])  # warm + true sync
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.time() - t0) / reps


def main(n=8627, m=5000, d=20):
    from mellon_tpu.ops.pallas_kernels import matern52_gram_pallas
    from mellon_tpu.utils.util import distance

    log(f"devices: {jax.devices()}  n={n:,} m={m:,} d={d}")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, d), dtype=jnp.float32)
    y = jax.random.normal(jax.random.fold_in(key, 1), (m, d), dtype=jnp.float32)

    @jax.jit
    def xla_matern(x, y, ls):
        r = jnp.sqrt(5.0) * distance(x, y) / ls
        return (r + jnp.square(r) / 3 + 1) * jnp.exp(-r)

    t_xla = time_fn(xla_matern, x, y, 2.0)
    gb = n * m * 4 / 1e9
    log(f"XLA matern52 gram:    {t_xla*1e3:7.2f} ms  ({gb/t_xla:.0f} GB/s out)")
    try:
        t_pl = time_fn(lambda a, b: matern52_gram_pallas(a, b, 2.0), x, y)
        log(f"Pallas matern52 gram: {t_pl*1e3:7.2f} ms  ({gb/t_pl:.0f} GB/s out)")
        err = float(
            jnp.max(jnp.abs(matern52_gram_pallas(x, y, 2.0) - xla_matern(x, y, 2.0)))
        )
        log(f"pallas-vs-xla max abs err: {err:.2e}")
    except Exception as e:
        log(f"pallas kernel unavailable: {type(e).__name__}: {e}")

    # --- bf16 L gradient throughput -----------------------------------------
    from mellon_tpu.inference.losses import density_loss

    n2, m2 = 100_000, 5_000
    L32 = jax.random.normal(jax.random.fold_in(key, 2), (n2, m2), dtype=jnp.float32)
    L32 = L32 / jnp.sqrt(m2)
    L16 = L32.astype(jnp.bfloat16)
    nn = 0.05 + 0.3 * jax.random.uniform(
        jax.random.fold_in(key, 3), (n2,), dtype=jnp.float32
    )
    z = jnp.zeros(m2, dtype=jnp.float32)

    @jax.jit
    def grad_scan(z, L, nn):
        def body(z, _):
            v, g = jax.value_and_grad(density_loss)(z, L, nn, 20.0, -10.0)
            return z - 1e-6 * g, v

        return jax.lax.scan(body, z, None, length=50)

    t32 = time_fn(grad_scan, z, L32, nn, reps=2) / 50
    log(f"grad eval f32  L ({n2:,}x{m2:,}): {t32*1e3:.3f} ms")
    t16 = time_fn(grad_scan, z, L16, nn, reps=2) / 50
    log(f"grad eval bf16 L ({n2:,}x{m2:,}): {t16*1e3:.3f} ms  ({t32/t16:.2f}x)")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
