"""North-star benchmark: NUTS effective samples / second / chip on the
density model at 100k cells × 5k landmarks (BASELINE.json primary metric).

The MCMC run is one compiled program with operand-threaded model arrays;
timing is reported for the full run (warmup+sampling) and for sampling only,
with ESS from the post-hoc autocorrelation estimate.

Usage: python scripts/nuts_bench.py [n] [m] [num_warmup] [num_samples] [num_chains] [precision]

precision: "f32" (default) or "bf16" — bf16 stores the (n, m) matrix L in
bfloat16 (f32 accumulation), halving the HBM traffic of the leapfrog loop.
"""

import sys
import time

from _common import jax, log  # noqa: F401  (repo path + compile cache)

import jax.numpy as jnp
import numpy as np



def main(n=100_000, m=5_000, num_warmup=60, num_samples=60, num_chains=2,
         precision="f32"):
    from mellon_tpu.inference.losses import density_loss
    from mellon_tpu.inference.mcmc import run_mcmc
    from mellon_tpu.inference.diagnostics import effective_sample_size

    log(f"devices: {jax.devices()}  n={n:,} m={m:,}")
    key = jax.random.PRNGKey(0)
    L = jax.random.normal(key, (n, m), dtype=jnp.float32) / jnp.sqrt(m)
    nn = 0.05 + 0.3 * jax.random.uniform(
        jax.random.fold_in(key, 1), (n,), dtype=jnp.float32
    )
    d, mu = 20.0, -10.0

    # start at the MAP (the realistic entry point: sample_density_posterior
    # seeds chains from the fitted pre_transformation); far-from-typical-set
    # starts would drive the step-size adaptation into max-depth trees
    from mellon_tpu.inference.optimizers import minimize_lbfgsb

    t0 = time.time()
    res_map = minimize_lbfgsb(
        density_loss, jnp.zeros(m, dtype=jnp.float32),
        loss_args=(L, nn, d, mu),
    )
    z0 = res_map.pre_transformation
    log(f"MAP warm start: {time.time()-t0:.1f}s (loss {res_map.loss:.4g})")

    if precision == "bf16":
        # bf16 storage for the leapfrog hot loop (f32 accumulation in the
        # matvec — see density_loss); halves HBM traffic at the roofline
        L = L.astype(jnp.bfloat16)
        log("using bf16 storage for L")

    t0 = time.time()
    result = run_mcmc(
        density_loss,
        z0,
        jax.random.PRNGKey(1),
        num_warmup=num_warmup,
        num_samples=num_samples,
        num_chains=num_chains,
        max_tree_depth=7,
        initial_step_size=0.05,
        potential_args=(L, nn, d, mu),
    )
    jax.device_get(result.step_size)  # true sync (relay block can be weak)
    t_total_cold = time.time() - t0
    log(f"cold run (compile + warmup + sampling): {t_total_cold:.1f}s")

    t0 = time.time()
    result = run_mcmc(
        density_loss,
        z0,
        jax.random.PRNGKey(2),
        num_warmup=num_warmup,
        num_samples=num_samples,
        num_chains=num_chains,
        max_tree_depth=7,
        initial_step_size=0.05,
        potential_args=(L, nn, d, mu),
    )
    jax.device_get(result.step_size)
    t_total = time.time() - t0

    total_draws = num_chains * num_samples
    total_leapfrogs = int(np.asarray(result.num_leapfrog).sum())
    # ESS on a subset of dimensions (full m x autocorr is slow on host)
    sub = np.random.RandomState(0).choice(m, size=min(m, 64), replace=False)
    ess = effective_sample_size(np.asarray(result.samples)[:, :, sub])
    accept = float(np.asarray(result.accept_prob).mean())
    div = int(np.asarray(result.diverging).sum())

    log(
        f"warm run: {t_total:.2f}s for {total_draws} draws "
        f"({total_leapfrogs:,} leapfrogs, accept {accept:.2f}, {div} divergences)"
    )
    log(
        f"draws/s: {total_draws / t_total:.2f}   "
        f"leapfrogs/s: {total_leapfrogs / t_total:,.0f}   "
        f"min/median ESS/s: {ess.min() / t_total:.2f} / "
        f"{np.median(ess) / t_total:.2f}"
    )

    # --- roofline / MFU for the leapfrog hot loop --------------------------
    # each leapfrog evaluates value_and_grad(density_loss): the (n, m)
    # matvec f = L z (2nm FLOPs) forward and dz = Lᵀ df (2nm) backward,
    # per chain -> 4·n·m·chains FLOPs and two full reads of L from HBM.
    # num_leapfrog only counts the sampling phase while t_total includes
    # warmup, so warmup trees are estimated at the sampled leapfrogs/draw
    # rate (post-adaptation tree depth is stationary).
    V5E_PEAK_BF16_FLOPS = 197e12  # MXU peak (f32 storage runs bf16 passes)
    V5E_HBM_BYTES_S = 819e9
    lf_per_draw = total_leapfrogs / max(total_draws, 1)
    # chain-leapfrogs: every chain's matvec column costs FLOPs...
    est_leapfrogs = lf_per_draw * (num_warmup + num_samples) * num_chains
    # ...but chains execute in LOCKSTEP inside the vmapped tree, so L is
    # read from HBM once per JOINT leapfrog (the (n,m)x(m,chains) matmul
    # shares the pass) — bytes divide by the chain count
    joint_leapfrogs = est_leapfrogs / num_chains
    flops = 4.0 * n * m * est_leapfrogs
    # default-precision f32 matmuls run ONE bf16 pass on the MXU and XLA
    # hoists the f32->bf16 conversion of the loop-invariant L out of the
    # scan, so the steady-state loop streams 2 bytes/element regardless of
    # the storage dtype (with f32-per-pass bytes the measured rate exceeds
    # the HBM peak, which is physically impossible)
    stream_itemsize = min(L.dtype.itemsize, 2)
    bytes_moved = 2.0 * n * m * stream_itemsize * joint_leapfrogs
    achieved_flops = flops / t_total
    achieved_bw = bytes_moved / t_total
    ai = flops / bytes_moved  # FLOP/byte; MXU ridge is ~240 at bf16
    bound = "HBM-bandwidth" if ai < V5E_PEAK_BF16_FLOPS / V5E_HBM_BYTES_S \
        else "MXU"
    log(
        f"roofline (est. incl. warmup trees): "
        f"{achieved_flops / 1e12:.2f} TFLOP/s "
        f"({100 * achieved_flops / V5E_PEAK_BF16_FLOPS:.1f}% of v5e MXU peak), "
        f"{achieved_bw / 1e9:.0f} GB/s "
        f"({100 * achieved_bw / V5E_HBM_BYTES_S:.1f}% of v5e HBM peak); "
        f"arithmetic intensity {ai:.1f} FLOP/B -> {bound}-bound"
    )


if __name__ == "__main__":
    # precision may appear at any position; the remaining args are the
    # numeric parameters in declaration order
    argv = sys.argv[1:]
    precision = next((a for a in argv if a in ("f32", "bf16")), "f32")
    nums = [int(a) for a in argv if a not in ("f32", "bf16")]
    main(*nums, precision=precision)
