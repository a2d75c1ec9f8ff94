"""Sampler-state checkpointing for long multi-host runs.

NEW capability relative to the reference, whose only persistence story is the
predictor JSON (``mellon/base_predictor.py:541-734``); mid-run sampler state
(chain positions, adapted step size, mass matrix, RNG key) had no
counterpart.  The format is a plain ``.npz`` of named arrays plus a JSON
sidecar of metadata — portable, dependency-free, and gather-on-save (each
host writes only from process 0).
"""

import json
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("mellon_tpu")

FORMAT_VERSION = 1


def save_sampler_state(path, *, samples=None, state=None, step_size=None,
                       inv_mass_diag=None, rng_key=None, metadata=None):
    """Write a sampler checkpoint.

    Arrays are gathered to host (fully replicated view) before writing; only
    process 0 writes in a multi-host setting.
    """
    arrays = {}

    def put(name, value):
        if value is None:
            return
        arrays[name] = np.asarray(jax.device_get(value))

    put("step_size", step_size)
    put("inv_mass_diag", inv_mass_diag)
    put("rng_key", rng_key)
    if samples is not None:
        put("samples", samples)
    if state is not None:
        flat, treedef = jax.tree.flatten(state)
        for i, leaf in enumerate(flat):
            put(f"state_{i}", leaf)
        arrays["_state_num_leaves"] = np.asarray(len(flat))

    if jax.process_index() == 0:
        base = _base_path(path)
        np.savez(base + ".npz", **arrays)
        meta = {"format_version": FORMAT_VERSION}
        if metadata:
            meta.update(metadata)
        with open(base + ".json", "w") as f:
            json.dump(meta, f)
        logger.info("Wrote sampler checkpoint to %s.npz.", base)


def _base_path(path):
    """Checkpoint base name: '<base>.npz' holds arrays, '<base>.json' the
    metadata, regardless of whether the caller passes the base or the full
    .npz name."""
    base = str(path)
    return base[: -len(".npz")] if base.endswith(".npz") else base


def load_sampler_state(path, state_template=None):
    """Load a checkpoint written by :func:`save_sampler_state`.

    Returns a dict with keys among {samples, state, step_size,
    inv_mass_diag, rng_key, metadata}.
    """
    data = np.load(_base_path(path) + ".npz")
    out = {}
    for key in ("step_size", "inv_mass_diag", "samples"):
        if key in data:
            out[key] = jnp.asarray(data[key])
    if "rng_key" in data:
        out["rng_key"] = jnp.asarray(data["rng_key"], dtype=jnp.uint32)
    if "_state_num_leaves" in data:
        n = int(data["_state_num_leaves"])
        leaves = [jnp.asarray(data[f"state_{i}"]) for i in range(n)]
        if state_template is not None:
            treedef = jax.tree.structure(state_template)
            out["state"] = jax.tree.unflatten(treedef, leaves)
        else:
            out["state"] = leaves
    meta_path = _base_path(path) + ".json"
    if not os.path.exists(meta_path) and os.path.exists(str(path) + ".json"):
        # checkpoints written before path normalization placed the sidecar
        # at '<path>.json' even when path already ended in '.npz'
        meta_path = str(path) + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            out["metadata"] = json.load(f)
    return out
