"""Throughput and scaling benchmarks for the density log-prob.

Measures the north-star secondary metric (BASELINE.json): log-prob (+grad)
evaluations per second at 100k cells × 5k landmarks on the current
accelerator, plus multi-device scaling of the cell-sharded loss (on a CPU
virtual mesh when no multi-chip hardware is present).

Usage:
  python scripts/scaling_bench.py            # current backend, n=100k m=5k
  python scripts/scaling_bench.py 10000 500  # smaller workload
"""

import sys
import time

from _common import jax, log  # noqa: F401  (repo path + compile cache)

import jax.numpy as jnp



def make_operands(key, n, m):
    L = jax.random.normal(key, (n, m), dtype=jnp.float32) / jnp.sqrt(m)
    nn = 0.05 + 0.3 * jax.random.uniform(
        jax.random.fold_in(key, 1), (n,), dtype=jnp.float32
    )
    return L, nn


def throughput(n, m, d=20.0, mu=-10.0, reps=200):
    from mellon_tpu.inference.losses import density_loss

    key = jax.random.PRNGKey(0)
    L, nn = make_operands(key, n, m)
    z = jnp.zeros(m, dtype=jnp.float32)

    @jax.jit
    def grad_evals(z, L, nn):
        def body(z, _):
            v, g = jax.value_and_grad(density_loss)(z, L, nn, d, mu)
            return z - 1e-6 * g, v

        return jax.lax.scan(body, z, None, length=reps)

    t0 = time.time()
    _, vals = grad_evals(z, L, nn)
    vals.block_until_ready()
    log(f"compile+first {reps} grad evals: {time.time()-t0:.2f}s")
    t0 = time.time()
    _, vals = grad_evals(z, L, nn)
    vals.block_until_ready()
    dt = time.time() - t0
    rate = reps / dt
    flops = 4 * n * m * reps  # fwd+bwd matvec, 2 flops/MAC
    log(
        f"log-prob+grad: {rate:,.0f} evals/s "
        f"({dt/reps*1e3:.3f} ms/eval, {flops/dt/1e12:.2f} TFLOP/s) "
        f"at n={n:,} m={m:,}"
    )
    return rate


def mesh_scaling(n, m, d=20.0, mu=-10.0, reps=50):
    from mellon_tpu.inference.losses import density_loss
    from mellon_tpu.parallel.mesh import CELL_AXIS, create_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = len(jax.devices())
    key = jax.random.PRNGKey(0)
    L, nn = make_operands(key, n, m)
    z = jnp.zeros(m, dtype=jnp.float32)

    results = {}
    n_cells_options = [x for x in (1, 2, 4, 8, 16) if x <= n_dev]
    for n_cells in n_cells_options:
        mesh = create_mesh(
            n_chains=1, n_cells=n_cells, devices=jax.devices()[:n_cells]
        )
        L_sh = jax.device_put(L, NamedSharding(mesh, P(CELL_AXIS, None)))
        nn_sh = jax.device_put(nn, NamedSharding(mesh, P(CELL_AXIS)))
        z_sh = jax.device_put(z, NamedSharding(mesh, P()))

        @jax.jit
        def grad_evals(z, L, nn):
            def body(z, _):
                v, g = jax.value_and_grad(density_loss)(z, L, nn, d, mu)
                return z - 1e-6 * g, v

            return jax.lax.scan(body, z, None, length=reps)

        _, vals = grad_evals(z_sh, L_sh, nn_sh)
        vals.block_until_ready()
        t0 = time.time()
        _, vals = grad_evals(z_sh, L_sh, nn_sh)
        vals.block_until_ready()
        dt = time.time() - t0
        results[n_cells] = reps / dt
        base = results[n_cells_options[0]]
        eff = results[n_cells] / (base * n_cells / n_cells_options[0])
        log(
            f"cells-sharded over {n_cells} device(s): "
            f"{results[n_cells]:,.1f} evals/s (efficiency {eff:.0%})"
        )
    return results


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    log(f"devices: {jax.devices()}")
    throughput(n, m)
    if len(jax.devices()) > 1:
        mesh_scaling(n, m)
    else:
        log(
            "single device: skipping mesh scaling. For the CPU virtual-mesh "
            "measurement run with JAX_PLATFORMS=cpu and "
            'jax.config.update("jax_num_cpu_devices", 8) before first jax '
            "use (tests/test_mcmc.py drives the same sharding on the "
            "8-device virtual mesh)."
        )
