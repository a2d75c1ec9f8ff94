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

Robustness contract (round-2 postmortem: the driver's bench capture timed
out during warmup and the then-45-min watchdog never fired, so the round's
scoreboard recorded nothing): every exit path emits exactly one JSON line
on stdout, inside an 18-minute global deadline that sits safely within the
driver's budget.  Phases (data / warmup / measure) each carry their own
deadline; on expiry the line names the stalled phase.  After the FIRST
measured fit the result is stored, so a stall in any later fit emits that
preliminary number instead of an error — a late wedge can no longer erase
the round's measurement.
"""

import json
import os
import signal
import sys
import time

import numpy as np

BASELINE_SECONDS = 28.4  # notebooks/basic_tutorial.ipynb cell 12 ("Wall time: 28.4 s")
N_CELLS = 8627
N_DIMS = 20

# Global deadline must undercut the driver's capture budget (~30 min per the
# round-2 record) with margin; phases subdivide it so the error line can say
# WHERE the relay stalled.
TOTAL_DEADLINE_S = 1080  # 18 min
PHASE_DEADLINES_S = {
    "startup": 120,
    "data": 120,
    # relay cold program loads land here; observed 444 s unloaded and
    # > 840 s when the 2-vCPU host is contended — give warmup most of the
    # global budget (the data phase actually takes ~10 s)
    "warmup": 900,
    "measure": 150,  # per measured fit; warm fits are ~0.25 s
}

_START = time.time()
_PHASE = "startup"
_PRELIMINARY = None  # result dict stored after the first measured fit
_EMITTED = False


def _emit_once(result):
    """Print the single JSON line; every path funnels through here."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    print(json.dumps(result), flush=True)


def _error_result(message):
    return {
        "metric": "density_fit_predict_8627_cells_warm_seconds",
        "value": None,
        "unit": "s",
        "vs_baseline": None,
        "error": message,
    }


def _on_deadline(signum, frame):
    elapsed = time.time() - _START
    if _PRELIMINARY is not None:
        # a later fit stalled, but a measured number exists — report it
        result = dict(_PRELIMINARY)
        result["preliminary_after_stall"] = (
            f"phase '{_PHASE}' stalled at t={elapsed:.0f}s; value is the "
            "first measured fit"
        )
        _emit_once(result)
    else:
        _emit_once(_error_result(
            f"deadline: phase '{_PHASE}' stalled (t={elapsed:.0f}s, "
            "TPU relay program load wedged?)"
        ))
    os._exit(2)


def _enter_phase(name):
    """Arm the alarm for min(phase deadline, remaining global budget)."""
    global _PHASE
    _PHASE = name
    remaining = TOTAL_DEADLINE_S - (time.time() - _START)
    if remaining <= 1:
        _on_deadline(None, None)
    budget = min(PHASE_DEADLINES_S.get(name, 300), remaining)
    print(
        f"[bench] phase={name} t={time.time()-_START:.0f}s "
        f"budget={budget:.0f}s",
        file=sys.stderr,
        flush=True,
    )
    try:
        signal.alarm(max(1, int(budget)))
    except (ValueError, AttributeError, OSError):
        pass


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
    global _PRELIMINARY
    import jax

    # persistent compilation cache: repeated bench runs skip recompiles
    cache_dir = "/tmp/mellon_tpu_jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    try:
        n_cached = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
        print(f"[bench] compile cache: {n_cached} entries at {cache_dir}",
              file=sys.stderr, flush=True)
    except OSError:
        pass

    _enter_phase("data")
    key = jax.random.PRNGKey(42)
    # Use the accuracy artifact's exact data when present (backend float
    # kernels differ, so regenerating on TPU would not match the stored
    # host-f64 reference fit bit-for-bit); fall back to regenerating.
    x = None
    x_np = None
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

    _enter_phase("warmup")
    t0 = time.time()
    run_fit(x_warm)
    print(f"[bench] warmup fit: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    # median of 3 measured fits: the accelerator is reached through a relay
    # whose per-call latency jitters; the median is robust to one hiccup
    # without cherry-picking the best case
    times = []
    ld = None
    for i in range(3):
        _enter_phase("measure")
        t0 = time.time()
        ld = run_fit(x)
        times.append(time.time() - t0)
        print(f"[bench] measured fit {i}: {times[-1]:.3f}s", file=sys.stderr, flush=True)
        if _PRELIMINARY is None:
            # from here on, a relay stall reports this number, not an error
            _PRELIMINARY = {
                "metric": "density_fit_predict_8627_cells_warm_seconds",
                "value": round(times[0], 3),
                "unit": "s",
                "vs_baseline": round(BASELINE_SECONDS / times[0], 3),
            }
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
    _enter_phase("certificate")
    try:
        from accuracy_cert import compare

        cert = compare(np.asarray(ld), x_np=np.asarray(x, dtype=np.float32))
        if cert:
            result.update(cert)
    except Exception as e:  # the timing line must never be lost to the cert
        result["accuracy_cert_error"] = f"{type(e).__name__}: {e}"
    _emit_once(result)


if __name__ == "__main__":
    try:
        signal.signal(signal.SIGALRM, _on_deadline)
        signal.alarm(PHASE_DEADLINES_S["startup"])
    except (ValueError, AttributeError, OSError):
        pass  # non-main thread or platform without SIGALRM

    try:
        main()
    except Exception as e:  # keep the contract: always emit one JSON line
        if _PRELIMINARY is not None:
            result = dict(_PRELIMINARY)
            result["preliminary_after_stall"] = (
                f"phase '{_PHASE}' raised {type(e).__name__}: {e}"
            )
            _emit_once(result)
        else:
            _emit_once(_error_result(f"phase '{_PHASE}': {type(e).__name__}: {e}"))
        sys.exit(1)
    finally:
        # disarm: a post-success teardown stall must not fire the handler
        # after the result line has already been printed
        try:
            signal.alarm(0)
        except (ValueError, AttributeError, OSError):
            pass
