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
