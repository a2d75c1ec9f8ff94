"""Benchmark: DensityEstimator fit_predict on the reference's headline
workload shape (8,627 cells, 5000-landmark sparse GP — the basic-tutorial
measurement that took the reference 28.4 s on CPU, see BASELINE.md).

Methodology: one warmup fit on identically-shaped data loads/compiles every
program (the execution environment reaches the TPU through a relay whose
per-program load latency is large and unrelated to the hardware), then the
measured fit runs end-to-end warm — kNN, k-means landmarks, kernel
factorization, whitened L-BFGS MAP, density extraction.  This reflects the
steady-state per-fit cost a production deployment sees.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the speedup over the reference's 28.4 s (>1 is faster).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_SECONDS = 28.4  # notebooks/basic_tutorial.ipynb cell 12 ("Wall time: 28.4 s")
N_CELLS = 8627
N_DIMS = 20


def make_data(key, n, d):
    """Clustered synthetic data mimicking diffusion-map eigenvector scales."""
    import jax
    import jax.numpy as jnp

    k_centers, k_assign, k_noise, k_scale = jax.random.split(key, 4)
    n_clusters = 12
    centers = jax.random.normal(k_centers, (n_clusters, d)) * 2.0
    assign = jax.random.randint(k_assign, (n,), 0, n_clusters)
    scales = 0.3 + 0.4 * jax.random.uniform(k_scale, (n_clusters, 1))
    x = centers[assign] + scales[assign] * jax.random.normal(k_noise, (n, d))
    # decaying per-dimension scale like DM eigenvectors
    decay = jnp.exp(-0.15 * jnp.arange(d))
    return x * decay[None, :]


def run_fit(x):
    import jax.numpy as jnp

    import mellon_tpu

    est = mellon_tpu.DensityEstimator()
    log_density = est.fit_predict(x)
    log_density.block_until_ready()
    assert bool(jnp.all(jnp.isfinite(log_density))), "non-finite density"
    return log_density


def main():
    import jax

    # persistent compilation cache: repeated bench runs skip recompiles
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/mellon_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    key = jax.random.PRNGKey(42)
    # Use the accuracy artifact's exact data when present (backend float
    # kernels differ, so regenerating on TPU would not match the stored
    # host-f64 reference fit bit-for-bit); fall back to regenerating.
    x = None
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from accuracy_cert import artifact_x

        x_np = artifact_x()
        if x_np is not None:
            import jax.numpy as jnp

            x = jnp.asarray(x_np)
    except Exception:
        pass
    if x is None:
        x = make_data(key, N_CELLS, N_DIMS)
    x.block_until_ready()
    x_warm = make_data(jax.random.PRNGKey(7), N_CELLS, N_DIMS)
    x_warm.block_until_ready()

    print("warmup fit ...", file=sys.stderr, flush=True)
    t0 = time.time()
    run_fit(x_warm)
    print(f"warmup fit: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    # median of 3 measured fits: the accelerator is reached through a relay
    # whose per-call latency jitters; the median is robust to one hiccup
    # without cherry-picking the best case
    times = []
    for i in range(3):
        t0 = time.time()
        ld = run_fit(x)
        times.append(time.time() - t0)
        print(f"measured fit {i}: {times[-1]:.3f}s", file=sys.stderr, flush=True)
    elapsed = sorted(times)[1]

    result = {
        "metric": "density_fit_predict_8627_cells_warm_seconds",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / elapsed, 3),
    }
    # accuracy certificate: every timing carries the fidelity of the fast
    # f32 pruned fit against a host-f64 full-landmark fit on the SAME data
    # (artifact written by scripts/accuracy_cert.py --write-reference;
    # reproducible bit-for-bit — the data is PRNG-derived)
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from accuracy_cert import compare

        cert = compare(np.asarray(ld), x_np=np.asarray(x, dtype=np.float32))
        if cert:
            result.update(cert)
    except Exception as e:  # the timing line must never be lost to the cert
        result["accuracy_cert_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(result))


def _emit_error_line(message):
    print(json.dumps({
        "metric": "density_fit_predict_8627_cells_warm_seconds",
        "value": None,
        "unit": "s",
        "vs_baseline": None,
        "error": message,
    }), flush=True)


if __name__ == "__main__":
    # Watchdog: the TPU relay occasionally wedges mid-program-load; without
    # this the bench would hang forever instead of reporting. 45 min is
    # several times the worst observed cold run.
    import signal

    def _watchdog(signum, frame):
        _emit_error_line("watchdog: exceeded 45 min (TPU relay stalled?)")
        import os

        os._exit(2)

    try:
        signal.signal(signal.SIGALRM, _watchdog)
        signal.alarm(2700)
    except (ValueError, AttributeError, OSError):
        pass  # non-main thread or platform without SIGALRM

    try:
        main()
    except Exception as e:  # keep the contract: always emit one JSON line
        _emit_error_line(f"{type(e).__name__}: {e}")
        sys.exit(1)
    finally:
        # disarm: a post-success teardown stall must not emit a SECOND
        # JSON line after the result has already been printed
        try:
            signal.alarm(0)
        except (ValueError, AttributeError, OSError):
            pass
