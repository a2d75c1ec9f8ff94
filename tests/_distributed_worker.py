"""Worker for the 2-process jax.distributed tests.

Run as: python tests/_distributed_worker.py <port> <process_id> <tmpdir>

Each process initializes the distributed runtime, then exercises the two
pod-slice configurations SURVEY.md §5.4/§5.8 call for:

1. Checkpoint: build a GLOBAL sharded array (not fully addressable from
   either process), save a checkpoint (cross-process ``process_allgather``
   + typed-PRNG-key encoding), synchronize, load it back.
2. Sampling: run a short-but-real ``run_mcmc`` window and a full ``run_smc``
   sweep with the density-model operands (L, nn_distances) sharded ACROSS
   the two processes on a global cells mesh — the per-cell log-likelihood
   reduction lowers to a cross-process all-reduce — asserting finite
   results and moment/evidence agreement with a process-local run of the
   same seeds.
"""

import os
import sys


def main():
    port, pid, tmpdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mellon_tpu.parallel.mesh import distributed_initialize

    distributed_initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mellon_tpu.parallel.checkpoint import (
        load_sampler_state,
        save_sampler_state,
    )

    devs = jax.devices()
    assert len(devs) >= 2, devs
    mesh = Mesh(np.asarray(devs[:2]), ("chains",))
    sharding = NamedSharding(mesh, P("chains"))
    reference = np.arange(8.0)
    arr = jax.make_array_from_callback(
        reference.shape, sharding, lambda idx: reference[idx]
    )
    assert not arr.is_fully_addressable

    key = jax.random.key(7)
    path = os.path.join(tmpdir, "ckpt")
    save_sampler_state(
        path,
        samples=arr,
        rng_key=key,
        step_size=jnp.asarray(0.25),
        metadata={"algorithm": "nuts"},
    )

    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ckpt_written")

    loaded = load_sampler_state(path)
    np.testing.assert_allclose(np.asarray(loaded["samples"]), reference)
    assert float(loaded["step_size"]) == 0.25
    assert jnp.issubdtype(loaded["rng_key"].dtype, jax.dtypes.prng_key)
    assert float(jax.random.uniform(loaded["rng_key"])) == float(
        jax.random.uniform(key)
    )
    assert loaded["metadata"]["algorithm"] == "nuts"
    print(f"WORKER_CKPT_OK {pid}", flush=True)

    # ---- cross-process sampling: NUTS + SMC over a process-spanning mesh --
    from mellon_tpu.inference.losses import density_loss
    from mellon_tpu.inference.mcmc import run_mcmc
    from mellon_tpu.inference.smc import loglik_from_loss, run_smc

    def fetch(a):
        if a.is_fully_addressable:
            return np.asarray(a)
        return np.asarray(multihost_utils.process_allgather(a, tiled=True))

    n, m = 64, 8
    cells_mesh = Mesh(np.asarray(devs[:2]), ("cells",))
    rng = np.random.RandomState(0)
    L_host = (rng.randn(n, m) / np.sqrt(m)).astype(np.float32)
    nn_host = (0.1 + 0.4 * rng.rand(n)).astype(np.float32)
    L_g = jax.make_array_from_callback(
        L_host.shape,
        NamedSharding(cells_mesh, P("cells", None)),
        lambda idx: L_host[idx],
    )
    nn_g = jax.make_array_from_callback(
        nn_host.shape,
        NamedSharding(cells_mesh, P("cells")),
        lambda idx: nn_host[idx],
    )
    assert not L_g.is_fully_addressable
    d_arr = jnp.asarray(3.0)
    mu_arr = jnp.asarray(-1.0)

    def nuts(operands):
        return run_mcmc(
            density_loss,
            jnp.zeros((2, m), dtype=jnp.float32),
            jax.random.PRNGKey(5),
            num_warmup=40,
            num_samples=40,
            num_chains=2,
            max_tree_depth=5,
            initial_step_size=0.1,
            potential_args=(*operands, d_arr, mu_arr),
        )

    res_g = nuts((L_g, nn_g))
    # process-local baseline: identical seeds and math, operands resident
    # on this process only (no collectives)
    res_l = nuts((jnp.asarray(L_host), jnp.asarray(nn_host)))
    s_g = fetch(res_g.samples)
    s_l = np.asarray(res_l.samples)
    assert np.all(np.isfinite(s_g)), "cross-process NUTS samples not finite"
    mean_g, mean_l = s_g.mean(axis=(0, 1)), s_l.mean(axis=(0, 1))
    std_g, std_l = s_g.std(axis=(0, 1)), s_l.std(axis=(0, 1))
    scale = max(float(np.max(std_l)), 1e-3)
    np.testing.assert_allclose(mean_g, mean_l, atol=0.5 * scale)
    np.testing.assert_allclose(std_g, std_l, rtol=0.5, atol=0.2 * scale)
    print(f"WORKER_NUTS_OK {pid}", flush=True)

    loglik = loglik_from_loss(density_loss)

    def smc(operands, seed):
        return run_smc(
            loglik,
            m,
            jax.random.PRNGKey(seed),
            num_particles=64,
            num_mutation_steps=2,
            num_leapfrog_steps=4,
            max_stages=12,
            loglik_args=(*operands, d_arr, mu_arr),
        )

    smc_g = smc((L_g, nn_g), seed=6)
    assert smc_g.betas[-1] == 1.0, smc_g.betas
    p_g = fetch(smc_g.particles)
    assert np.all(np.isfinite(p_g)), "cross-process SMC particles not finite"
    smc_l = smc((jnp.asarray(L_host), jnp.asarray(nn_host)), seed=6)
    assert abs(
        float(smc_g.log_evidence) - float(smc_l.log_evidence)
    ) < 1.0, (float(smc_g.log_evidence), float(smc_l.log_evidence))
    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
