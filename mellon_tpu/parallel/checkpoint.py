"""Sampler-state checkpointing for long multi-host runs.

NEW capability relative to the reference, whose only persistence story is the
predictor JSON (``mellon/base_predictor.py:541-734``); mid-run sampler state
(chain positions, adapted step size, mass matrix, RNG key) had no
counterpart.  The format is a plain ``.npz`` of named arrays plus a JSON
sidecar of metadata — portable and dependency-free.

Multi-host discipline: arrays that are not fully addressable (sharded over
several processes on a pod slice) are assembled with
``multihost_utils.process_allgather`` — a plain ``device_get`` would raise on
them — and only process 0 writes.  Typed PRNG keys (``jax.random.key``) are
stored as their raw key data plus the impl name in the sidecar and
reconstructed with ``wrap_key_data`` on load; legacy raw ``uint32`` keys
round-trip unchanged.
"""

import json
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("mellon_tpu")

FORMAT_VERSION = 2


def _gather_to_host(value):
    """Host numpy view of ``value``, assembling cross-process shards when the
    array is not fully addressable on this process."""
    if isinstance(value, jax.Array) and not value.is_fully_addressable:
        from jax.experimental import multihost_utils

        value = multihost_utils.process_allgather(value, tiled=True)
    return np.asarray(jax.device_get(value))


def _is_typed_prng_key(value):
    dtype = getattr(value, "dtype", None)
    return dtype is not None and jnp.issubdtype(dtype, jax.dtypes.prng_key)


def save_sampler_state(path, *, samples=None, state=None, step_size=None,
                       inv_mass_diag=None, rng_key=None, metadata=None):
    """Write a sampler checkpoint.

    Arrays are gathered to host (cross-process shards assembled) before
    writing; only process 0 writes in a multi-host setting.  Typed PRNG keys
    are supported anywhere in ``rng_key`` or the ``state`` pytree.
    """
    arrays = {}
    prng_impls = {}

    def put(name, value):
        if value is None:
            return
        if _is_typed_prng_key(value):
            prng_impls[name] = str(jax.random.key_impl(value))
            value = jax.random.key_data(value)
        arrays[name] = _gather_to_host(value)

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
        if prng_impls:
            meta["prng_impls"] = prng_impls
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
    inv_mass_diag, rng_key, metadata}.  Entries saved from typed PRNG keys
    come back as typed keys of the same impl; raw uint32 keys stay raw.
    """
    data = np.load(_base_path(path) + ".npz")

    metadata = None
    meta_path = _base_path(path) + ".json"
    if not os.path.exists(meta_path) and os.path.exists(str(path) + ".json"):
        # checkpoints written before path normalization placed the sidecar
        # at '<path>.json' even when path already ended in '.npz'
        meta_path = str(path) + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    prng_impls = (metadata or {}).get("prng_impls", {})

    def get(name):
        value = jnp.asarray(data[name])
        if name in prng_impls:
            return jax.random.wrap_key_data(
                value.astype(jnp.uint32), impl=prng_impls[name]
            )
        return value

    out = {}
    for key in ("step_size", "inv_mass_diag", "samples"):
        if key in data:
            out[key] = get(key)
    if "rng_key" in data:
        if "rng_key" in prng_impls:
            out["rng_key"] = get("rng_key")
        else:
            out["rng_key"] = jnp.asarray(data["rng_key"], dtype=jnp.uint32)
    if "_state_num_leaves" in data:
        n = int(data["_state_num_leaves"])
        leaves = [get(f"state_{i}") for i in range(n)]
        if state_template is not None:
            treedef = jax.tree.structure(state_template)
            out["state"] = jax.tree.unflatten(treedef, leaves)
        else:
            out["state"] = leaves
    if metadata is not None:
        out["metadata"] = metadata
    return out
