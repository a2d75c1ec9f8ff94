"""Stage-by-stage NaN hunt for the batched ls_time d=2 path on TPU.

The d=2 bench produced `ls_time nan` on TPU ("L-BFGS finished after 1
steps with loss nan") while the identical flow — including a forced
all-groups host-f64 rescue — is clean on CPU.  This script replays the
batched internals at the bench shape and fetches finiteness of every
intermediate BEFORE the joint L-BFGS program, to localize where the NaN
enters on the TPU numerics.

Usage: python scripts/debug_ls_time_nan.py
"""

import numpy as np

from _common import jax, log  # noqa: F401

import jax.numpy as jnp


def main():
    import sys

    sys.path.insert(0, ".")
    from bench import make_data
    from mellon_tpu.ops.neighbors import nn_distances
    from mellon_tpu.models import ls_time as lt
    from mellon_tpu.ops.linalg import host_cholesky_f64
    from mellon_tpu.utils.util import mle

    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    sizes = rng.randint(1700, 2500, size=10)
    n = int(sizes.sum())
    x = make_data(jax.random.PRNGKey(10), n, 2)
    nn = np.asarray(nn_distances(x))
    log(f"nn: min={nn.min():.3e} max={nn.max():.3e} "
        f"nonpos={(nn <= 0).sum()} nonfinite={(~np.isfinite(nn)).sum()}")
    nn_rep = nn.copy()
    bad = ~np.isfinite(nn_rep) | (nn_rep <= 0)
    if bad.any():
        nn_rep[bad] = nn_rep[~bad].min()

    x_np = np.asarray(x)
    T, n_pad, ds = len(sizes), int(sizes.max()), 2
    d = 2.0
    xg = np.zeros((T, n_pad, ds), dtype=np.float32)
    nng = np.ones((T, n_pad), dtype=np.float32)
    mask = np.zeros((T, n_pad), dtype=np.float32)
    off = 0
    for i, s in enumerate(sizes):
        xg[i, :s] = x_np[off:off + s]
        nng[i, :s] = nn_rep[off:off + s]
        mask[i, :s] = 1.0
        off += s
    xgj, nngj, maskj = jnp.asarray(xg), jnp.asarray(nng), jnp.asarray(mask)
    n_t = jnp.asarray(sizes, dtype=jnp.float32)

    mle_g = mle(nngj, d)
    mu_t = jax.vmap(lt._masked_quantile_01)(mle_g, maskj, n_t) - 10.0
    log_mean = jnp.sum(jnp.log(nngj) * maskj, axis=1) / n_t
    ls_t = jnp.exp(log_mean + 3.0)
    mu_np, ls_np, mle_fin = jax.device_get(
        (mu_t, ls_t, jnp.isfinite(mle_g).all())
    )
    log(f"mle finite={bool(mle_fin)}  mu_t={mu_np}  ls_t={ls_np}")

    host_core = lt._HOST_F64_CORES["matern52"]
    L = np.zeros((T, n_pad, n_pad), dtype=np.float32)
    for g in range(T):
        k = int(sizes[g])
        Kb = np.eye(n_pad)
        Kb[:k, :k] = host_core(
            xg[g, :k].astype(np.float64), float(ls_np[g])
        )
        L[g] = host_cholesky_f64(Kb, jitter=1e-6).astype(np.float32)
    log(f"host-rescued L: finite={np.isfinite(L).all()} "
        f"diagmin={min(np.diag(L[g]).min() for g in range(T)):.3e}")
    Lj = jnp.asarray(L)

    def ridge_one(L_t, mask_t, target_t):
        Lw = L_t * mask_t[:, None]
        G = Lw.T @ (L_t * mask_t[:, None])
        di = jnp.arange(G.shape[0])
        return jnp.linalg.solve(
            G.at[di, di].add(1.0), Lw.T @ (target_t * mask_t)
        )

    z0 = jax.jit(jax.vmap(ridge_one))(Lj, maskj, mle_g - mu_t[:, None])
    z0_fin, z0_max = jax.device_get(
        (jnp.isfinite(z0).all(), jnp.abs(z0).max())
    )
    log(f"z0 (TPU ridge, OLD bf16-pass LU): finite={bool(z0_fin)} "
        f"absmax={float(z0_max):.3e}")

    # the shipped fix: HIGHEST-precision Gram + Cholesky solve
    def ridge_chol(L_t, mask_t, target_t):
        from functools import partial as _p

        hp = _p(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
        Lw = L_t * mask_t[:, None]
        G = hp(Lw.T, Lw)
        di = jnp.arange(G.shape[0])
        rhs = hp(Lw.T, target_t * mask_t)
        from jax.scipy.linalg import solve_triangular

        c = jnp.linalg.cholesky(G.at[di, di].add(1.0))
        return solve_triangular(
            c.T, solve_triangular(c, rhs, lower=True), lower=False
        )

    z0c = jax.jit(jax.vmap(ridge_chol))(Lj, maskj, mle_g - mu_t[:, None])
    z0c_fin, z0c_max = jax.device_get(
        (jnp.isfinite(z0c).all(), jnp.abs(z0c).max())
    )
    log(f"z0 (TPU ridge, NEW HIGHEST+chol): finite={bool(z0c_fin)} "
        f"absmax={float(z0c_max):.3e}")

    dj = jnp.asarray(d, jnp.float32)
    loss0 = jax.jit(lt._batched_density_loss)(
        jnp.ravel(z0), Lj, nngj, maskj, mu_t, dj
    )
    g0 = jax.jit(jax.grad(lt._batched_density_loss))(
        jnp.ravel(z0), Lj, nngj, maskj, mu_t, dj
    )
    l0, gfin, gmax = jax.device_get(
        (loss0, jnp.isfinite(g0).all(), jnp.abs(g0).max())
    )
    log(f"loss at z0: {float(l0):.4f}  grad finite={bool(gfin)} "
        f"absmax={float(gmax):.3e}")

    # z0 from a HOST ridge (f64) as the control: isolates the TPU solve
    z0h = np.empty((T, n_pad), dtype=np.float32)
    tgt = np.asarray(jax.device_get(mle_g - mu_t[:, None]), dtype=np.float64)
    for g in range(T):
        Lw = L[g].astype(np.float64) * mask[g][:, None]
        G = Lw.T @ Lw + np.eye(n_pad)
        z0h[g] = np.linalg.solve(G, Lw.T @ (tgt[g] * mask[g])).astype(
            np.float32
        )
    lossh = jax.jit(lt._batched_density_loss)(
        jnp.ravel(jnp.asarray(z0h)), Lj, nngj, maskj, mu_t, dj
    )
    log(f"loss at host-ridge z0: {float(jax.device_get(lossh)):.4f}")


if __name__ == "__main__":
    main()
