"""End-to-end multi-device sampling on the virtual (chains x cells) mesh.

SURVEY.md §4 calls for multi-device tests on CPU-simulated meshes and §5.8
for the collective layout (cells axis -> all-reduce of the likelihood sum,
chains axis -> sampling data parallelism).  These tests run the REAL
programs — ``run_mcmc`` with full warmup + sampling, the operand-threaded
density loss — with the operands actually placed on a 2x4 mesh, and assert
both statistical agreement with the unsharded run and that the compiled
gradient lowers to an ``all-reduce``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mellon_tpu import DensityEstimator
from mellon_tpu.inference.diagnostics import summarize
from mellon_tpu.inference.losses import density_loss
from mellon_tpu.inference.mcmc import run_mcmc
from mellon_tpu.parallel.mesh import CELL_AXIS, CHAIN_AXIS, create_mesh


@pytest.fixture(scope="module")
def prepared_density():
    """A prepared (not fitted) density model with threaded loss operands."""
    x = jax.random.normal(jax.random.PRNGKey(6), (64, 2))
    est = DensityEstimator()
    est.prepare_inference(x)
    return est


@pytest.fixture(scope="module")
def mesh_2x4():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")
    return create_mesh(n_chains=2, n_cells=4)


def _sharded_operands(est, mesh):
    L, nn, d, mu = est._loss_args
    Ls = jax.device_put(L, NamedSharding(mesh, P(CELL_AXIS, None)))
    nns = jax.device_put(nn, NamedSharding(mesh, P(CELL_AXIS)))
    return (Ls, nns, d, mu)


def test_loss_grad_lowers_to_all_reduce(prepared_density, mesh_2x4):
    """The cell-sharded likelihood sum must compile to an all-reduce — the
    collective SURVEY.md §5.8 specifies — not to a gather-then-sum."""
    est = prepared_density
    Ls, nns, d, mu = _sharded_operands(est, mesh_2x4)
    z = jnp.zeros_like(est.initial_value)
    lowered = jax.jit(jax.grad(density_loss)).lower(z, Ls, nns, d, mu)
    hlo = lowered.compile().as_text()
    assert "all-reduce" in hlo
    g = jax.jit(jax.grad(density_loss))(z, Ls, nns, d, mu)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_full_mcmc_on_mesh_matches_unsharded(prepared_density, mesh_2x4):
    """run_mcmc — all three warmup phases plus sampling, NUTS — with L
    row-sharded over cells, nn_distances cell-sharded, and chains sharded
    over the chain axis must reproduce the unsharded posterior within MC
    error."""
    est = prepared_density
    key = jax.random.PRNGKey(0)
    z0 = jnp.broadcast_to(
        est.initial_value, (4, est.initial_value.shape[0])
    )
    L, nn, d, mu = est._loss_args

    res_local = run_mcmc(
        density_loss,
        z0,
        key,
        num_warmup=300,
        num_samples=400,
        num_chains=4,
        potential_args=(L, nn, d, mu),
    )
    s_local = summarize(res_local.samples)
    assert np.all(s_local["rhat"] < 1.05)

    sharded_args = _sharded_operands(est, mesh_2x4)
    res_sharded = run_mcmc(
        density_loss,
        z0,
        key,
        num_warmup=300,
        num_samples=400,
        num_chains=4,
        chain_sharding=NamedSharding(mesh_2x4, P(CHAIN_AXIS, None)),
        potential_args=sharded_args,
    )
    s_sharded = summarize(res_sharded.samples)
    assert np.all(s_sharded["rhat"] < 1.05)

    # posterior moments agree within MC error (probe run: max mean diff
    # ~0.013 at posterior std ~0.5; generous 5x headroom against seeds)
    np.testing.assert_allclose(
        s_sharded["mean"], s_local["mean"], atol=0.08
    )
    ratio = s_sharded["std"] / s_local["std"]
    assert float(ratio.min()) > 0.85 and float(ratio.max()) < 1.18

    # the sharded samples must carry the chain sharding through the scan
    assert bool(jnp.all(jnp.isfinite(res_sharded.samples)))


def test_mcmc_samples_transform_to_valid_densities(
    prepared_density, mesh_2x4
):
    """Function-space posterior from the sharded run: transform(z) per draw
    stays finite and centers near the MAP log-density."""
    est = prepared_density
    key = jax.random.PRNGKey(1)
    z0 = jnp.broadcast_to(
        est.initial_value, (4, est.initial_value.shape[0])
    )
    sharded_args = _sharded_operands(est, mesh_2x4)
    res = run_mcmc(
        density_loss,
        z0,
        key,
        num_warmup=200,
        num_samples=200,
        num_chains=4,
        chain_sharding=NamedSharding(mesh_2x4, P(CHAIN_AXIS, None)),
        potential_args=sharded_args,
    )
    flat = res.samples.reshape((-1, res.samples.shape[-1]))
    f = jax.vmap(est.transform)(flat)
    assert bool(jnp.all(jnp.isfinite(f)))
    est.run_inference()
    ld = np.asarray(est.transform(est.pre_transformation))
    f_mean = np.asarray(f.mean(axis=0))
    assert np.corrcoef(f_mean, ld)[0, 1] > 0.9
