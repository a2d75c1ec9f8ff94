"""Stage-by-stage wall-clock profile of the density-fit pipeline on the
current accelerator.  Development tool; prints one line per stage."""

import sys
import time

from _common import jax, log  # noqa: F401  (repo path + compile cache)

import jax.numpy as jnp



def main(n=8627, d=20, m=5000):
    from bench import make_data
    from mellon_tpu.ops.neighbors import nn_distances as compute_nn
    from mellon_tpu.ops.cluster import k_means
    from mellon_tpu.ops.linalg import _full_rank, _standard_low_rank, ridge_solve
    from mellon_tpu.ops.kernels import Matern52
    from mellon_tpu.parameters import compute_ls, compute_mu
    from mellon_tpu.inference.losses import compute_loss_func, compute_transform
    from mellon_tpu.inference.optimizers import minimize_lbfgsb
    from mellon_tpu.utils.util import mle

    log(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(42)
    x = make_data(key, n, d)
    x.block_until_ready()
    log("data ready")

    t0 = time.time()
    nn = compute_nn(x)
    nn.block_until_ready()
    log(f"nn_distances: {time.time()-t0:.2f}s")

    t0 = time.time()
    ls = compute_ls(nn)
    mu = compute_mu(nn, d)
    log(f"ls/mu heuristics: {time.time()-t0:.2f}s (ls={ls:.3f} mu={mu:.3f})")
    cov = Matern52(ls=ls)

    t0 = time.time()
    landmarks = k_means(x, m, random_state=42)
    landmarks.block_until_ready()
    log(f"k-means {m} landmarks: {time.time()-t0:.2f}s")

    t0 = time.time()
    Lp = _full_rank(landmarks, cov)
    Lp.block_until_ready()
    log(f"Lp cholesky {m}x{m}: {time.time()-t0:.2f}s")

    t0 = time.time()
    L = _standard_low_rank(x, cov, landmarks, Lp=Lp)
    L.block_until_ready()
    log(f"L triangular solve {n}x{m}: {time.time()-t0:.2f}s")

    t0 = time.time()
    target = mle(nn, d) - mu
    z0 = ridge_solve(L, target)
    z0.block_until_ready()
    log(f"ridge warm start: {time.time()-t0:.2f}s")

    transform = compute_transform(mu, L)
    loss = compute_loss_func(nn, d, transform, m)

    t0 = time.time()
    val = jax.jit(loss)(z0)
    val.block_until_ready()
    log(f"first loss eval (compile): {time.time()-t0:.2f}s (loss={float(val):.4g})")

    t0 = time.time()
    res = minimize_lbfgsb(loss, z0)
    log(f"L-BFGS: {time.time()-t0:.2f}s loss={res.loss:.6g}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8627
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 5000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(n, d, m)
