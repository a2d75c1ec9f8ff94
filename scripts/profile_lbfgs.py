"""Isolate the on-device L-BFGS cost: scanned raw grad evals vs optax.lbfgs
steps vs adam steps, on the bench-shaped density loss."""

import time

from _common import jax, log  # noqa: F401  (repo path + compile cache)

import jax.numpy as jnp



def main(n=8627, m=5000, d=20):
    from mellon_tpu.inference.likelihoods import (
        nearest_neighbors_likelihood,
        normal_prior,
    )
    from mellon_tpu.inference.optimizers import _run_adam, _run_lbfgs

    key = jax.random.PRNGKey(0)
    L = jax.random.normal(key, (n, m)) / jnp.sqrt(m)
    nn = 0.05 + 0.3 * jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    mu = -10.0
    prior = normal_prior(m)
    lik = nearest_neighbors_likelihood(nn, d)

    def loss(z):
        return -(prior(z) + lik(L @ z + mu))

    z0 = jnp.zeros(m)

    # raw scanned grad evals
    @jax.jit
    def scan_grads(z):
        def body(z, _):
            v, g = jax.value_and_grad(loss)(z)
            return z - 1e-6 * g, v

        return jax.lax.scan(body, z, None, length=100)

    t0 = time.time()
    z1, vals = scan_grads(z0)
    vals.block_until_ready()
    log(f"100 grad evals (incl compile): {time.time()-t0:.2f}s")
    t0 = time.time()
    z1, vals = scan_grads(z0)
    vals.block_until_ready()
    log(f"100 grad evals (warm): {time.time()-t0:.3f}s")

    # adam
    t0 = time.time()
    params, _, losses = _run_adam(loss, z0, 100, 0.1)
    losses.block_until_ready()
    log(f"adam 100 steps (incl compile): {time.time()-t0:.2f}s last={float(losses[-1]):.4g}")

    # lbfgs with small max_iter
    for it in (20, 100):
        t0 = time.time()
        params, value, n_steps = _run_lbfgs(loss, z0, it, 1e-5)
        value.block_until_ready()
        log(
            f"lbfgs max_iter={it}: {time.time()-t0:.2f}s "
            f"steps={int(n_steps)} loss={float(value):.6g}"
        )


if __name__ == "__main__":
    main()
