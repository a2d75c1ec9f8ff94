"""Checkpoint restore onto a DIFFERENT mesh topology (SURVEY.md §5.4).

A pod restart rarely resumes on the identical topology: these tests save a
sharded sampler state on a 2×4 (chains × cells) mesh, restore it onto a
4×2 mesh (resharding every operand with ``device_put`` under the new
``NamedSharding``), and resume sampling with :func:`resume_mcmc` — no
re-warmup.  Statistical continuity is asserted on the potential trace: the
resumed draws must sit inside the stationary band of the pre-checkpoint
sampling phase from the first draw on (a re-warmup transient or a broken
state restore would shift it).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mellon_tpu.inference.losses import density_loss
from mellon_tpu.inference.mcmc import resume_mcmc, run_mcmc
from mellon_tpu.parallel.checkpoint import (
    load_sampler_state,
    save_sampler_state,
)
from mellon_tpu.parallel.mesh import CELL_AXIS, CHAIN_AXIS, create_mesh


def _operands(n, m):
    rng = np.random.RandomState(0)
    L = jnp.asarray(rng.randn(n, m) / np.sqrt(m))
    nn = jnp.asarray(0.1 + 0.4 * rng.rand(n))
    return L, nn, jnp.asarray(3.0), jnp.asarray(-1.0)


def _shard_operands(mesh, L, nn, d, mu):
    return (
        jax.device_put(L, NamedSharding(mesh, P(CELL_AXIS, None))),
        jax.device_put(nn, NamedSharding(mesh, P(CELL_AXIS))),
        d,
        mu,
    )


@pytest.mark.slow
def test_checkpoint_restore_onto_different_mesh(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")

    n, m, n_chains = 64, 8, 8
    L, nn, d, mu = _operands(n, m)

    # ---- original run on the 2x4 mesh --------------------------------------
    mesh_a = create_mesh(n_chains=2, n_cells=4)
    chain_a = NamedSharding(mesh_a, P(CHAIN_AXIS, None))
    res_a = run_mcmc(
        density_loss,
        jnp.zeros((n_chains, m)),
        jax.random.PRNGKey(0),
        num_warmup=60,
        num_samples=60,
        num_chains=n_chains,
        max_tree_depth=5,
        chain_sharding=chain_a,
        potential_args=_shard_operands(mesh_a, L, nn, d, mu),
    )
    pots_a = np.asarray(res_a.potential)
    assert np.all(np.isfinite(pots_a))

    path = str(tmp_path / "reshard_ckpt")
    save_sampler_state(
        path,
        samples=res_a.samples[:, -1, :],  # the chains' final positions
        step_size=res_a.step_size,
        inv_mass_diag=res_a.inv_mass_diag,
        rng_key=jax.random.key(123),
        metadata={"algorithm": "nuts"},
    )

    # ---- restore onto the 4x2 mesh (different topology) --------------------
    mesh_b = create_mesh(n_chains=4, n_cells=2)
    chain_b = NamedSharding(mesh_b, P(CHAIN_AXIS, None))
    loaded = load_sampler_state(path)
    assert loaded["metadata"]["algorithm"] == "nuts"

    res_b = resume_mcmc(
        density_loss,
        loaded["samples"],
        jax.random.fold_in(jax.random.PRNGKey(1), 0),
        step_size=loaded["step_size"],
        inv_mass_diag=loaded["inv_mass_diag"],
        num_samples=60,
        max_tree_depth=5,
        chain_sharding=chain_b,
        potential_args=_shard_operands(mesh_b, L, nn, d, mu),
    )
    samples_b = np.asarray(res_b.samples)
    pots_b = np.asarray(res_b.potential)
    assert samples_b.shape == (n_chains, 60, m)
    assert np.all(np.isfinite(samples_b))
    # the adapted scalars survive the roundtrip untouched
    assert float(res_b.step_size) == pytest.approx(
        float(res_a.step_size), rel=1e-6
    )

    # ---- statistical continuity: no re-warmup transient ---------------------
    # the potential trace of the resumed run must sit in the stationary band
    # of the original SAMPLING phase immediately (first 10 draws), not decay
    # into it the way a fresh warmup does
    band_mean = pots_a.mean()
    band_std = pots_a.std()
    early_b = pots_b[:, :10].mean()
    assert abs(early_b - band_mean) < 4 * band_std, (
        f"resumed potential {early_b:.3f} outside stationary band "
        f"{band_mean:.3f} +- 4*{band_std:.3f}"
    )
    # and the resumed moments agree with the original sampling moments
    mean_a = np.asarray(res_a.samples).mean(axis=(0, 1))
    mean_b = samples_b.mean(axis=(0, 1))
    scale = max(float(np.asarray(res_a.samples).std()), 1e-3)
    np.testing.assert_allclose(mean_a, mean_b, atol=0.75 * scale)


def test_resume_mcmc_matches_stationary_distribution():
    """Single-device sanity: resume_mcmc on a standard Gaussian keeps the
    correct stationary distribution (no warmup bias from skipping phases)."""

    def pot(z):
        return 0.5 * jnp.sum(z**2)

    res = run_mcmc(
        pot,
        jnp.zeros((4, 3)),
        jax.random.PRNGKey(2),
        num_warmup=100,
        num_samples=50,
        num_chains=4,
        max_tree_depth=5,
    )
    resumed = resume_mcmc(
        pot,
        res.samples[:, -1, :],
        jax.random.PRNGKey(3),
        step_size=res.step_size,
        inv_mass_diag=res.inv_mass_diag,
        num_samples=400,
        max_tree_depth=5,
    )
    s = np.asarray(resumed.samples).reshape(-1, 3)
    np.testing.assert_allclose(s.mean(axis=0), np.zeros(3), atol=0.15)
    np.testing.assert_allclose(s.std(axis=0), np.ones(3), rtol=0.15)
