"""Observability subsystem tests (PhaseTimer + jax.profiler trace wrapper;
new capability relative to the reference — SURVEY.md §5.1)."""

import os

import jax.numpy as jnp

from mellon_tpu.utils.profiling import PhaseTimer, trace


def test_phase_timer_collects_and_reports():
    timer = PhaseTimer(name="test", log=False)
    with timer.phase("alpha"):
        x = jnp.ones(100) * 2.0
    with timer.phase("beta", x):
        y = jnp.sum(x)
    timer.sync()
    d = timer.as_dict()
    assert set(d) == {"alpha", "beta"}
    assert all(t >= 0 for t in d.values())
    report = timer.report()
    assert "alpha" in report and "beta" in report and "total" in report
    assert float(y) == 200.0


def test_phase_timer_handles_non_arrays():
    timer = PhaseTimer(log=False)
    with timer.phase("plain", 42, "not-an-array"):
        pass
    assert "plain" in timer.as_dict()


def test_trace_writes_profile(tmp_path):
    log_dir = str(tmp_path / "trace")
    with trace(log_dir) as d:
        jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    assert d == log_dir
    # a plugins/profile directory with at least one host file appears
    found = []
    for root, _, files in os.walk(log_dir):
        found.extend(files)
    assert found, "profiler trace produced no files"
