"""Worker for the 2-process jax.distributed checkpoint test.

Run as: python tests/_distributed_worker.py <port> <process_id> <tmpdir>

Each process initializes the distributed runtime, builds a GLOBAL sharded
array (not fully addressable from either process), saves a checkpoint
(exercising the cross-process ``process_allgather`` path and typed-PRNG-key
encoding), synchronizes, and loads it back.
"""

import os
import sys


def main():
    port, pid, tmpdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mellon_tpu.parallel.mesh import distributed_initialize

    distributed_initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mellon_tpu.parallel.checkpoint import (
        load_sampler_state,
        save_sampler_state,
    )

    devs = jax.devices()
    assert len(devs) >= 2, devs
    mesh = Mesh(np.asarray(devs[:2]), ("chains",))
    sharding = NamedSharding(mesh, P("chains"))
    reference = np.arange(8.0)
    arr = jax.make_array_from_callback(
        reference.shape, sharding, lambda idx: reference[idx]
    )
    assert not arr.is_fully_addressable

    key = jax.random.key(7)
    path = os.path.join(tmpdir, "ckpt")
    save_sampler_state(
        path,
        samples=arr,
        rng_key=key,
        step_size=jnp.asarray(0.25),
        metadata={"algorithm": "nuts"},
    )

    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ckpt_written")

    loaded = load_sampler_state(path)
    np.testing.assert_allclose(np.asarray(loaded["samples"]), reference)
    assert float(loaded["step_size"]) == 0.25
    assert jnp.issubdtype(loaded["rng_key"].dtype, jax.dtypes.prng_key)
    assert float(jax.random.uniform(loaded["rng_key"])) == float(
        jax.random.uniform(key)
    )
    assert loaded["metadata"]["algorithm"] == "nuts"
    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
