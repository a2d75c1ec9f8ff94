"""Test configuration: CPU backend with 8 virtual devices and x64 enabled.

The virtual 8-device mesh lets the DP/chain-sharding logic be exercised
without TPU hardware (cf. SURVEY.md §4); x64 matches the reference's CPU
numerics so tolerance-based parity tests are meaningful.

Implementation note: the platform is forced via ``jax.config`` rather than
``JAX_PLATFORMS``/``XLA_FLAGS`` env vars because this container may pre-import
jax with a TPU-tunnel PJRT plugin (sitecustomize) — env vars set here would be
too late, and ``--xla_force_host_platform_device_count`` stalls the tunnel's
backend init for minutes.  ``jax.config.update`` after import wins cleanly.
"""

import os

import jax

if os.environ.get("MELLON_TPU_TESTS"):
    # TPU accuracy-contract mode (``-m tpu``): keep the real backend and
    # its f32 numerics — forcing CPU here would make the approx_min_k
    # recall contract untestable (it lowers exactly on CPU).
    pass
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_enable_x64", True)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_xla_caches_between_modules():
    """Free XLA compile caches after each test module.

    A single-process full-suite run accumulates enough compiled-program
    state on the XLA CPU backend to segfault inside
    ``backend_compile_and_load`` at ~80% of the suite (round-4 weak #6;
    the failing test passes in isolation).  Dropping the caches at module
    boundaries bounds the live-executable set; individual modules
    recompile their shared fixtures at most once."""
    yield
    jax.clear_caches()
