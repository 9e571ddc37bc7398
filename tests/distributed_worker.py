"""Worker for the 2-process ``jax.distributed`` CPU test.

Run by ``test_parallel.py::test_two_process_distributed_psum`` in two
subprocesses: each initializes the distributed runtime through
``tpupose.parallel.initialize_distributed``, verifies the global device
view spans both processes, builds the production (data, spatial) mesh over
ALL global devices, and runs a cross-process ``psum`` — the same collective
path a multi-host TPU pod slice uses for gradient reduction (SURVEY.md
section 2, parallelism inventory).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import numpy as np

    from tpupose.parallel.mesh import (
        DATA_AXIS,
        initialize_distributed,
        make_mesh,
    )

    initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
    n_global = len(jax.devices())
    assert n_global == nproc * jax.local_device_count(), jax.devices()
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(n_data=n_global, n_spatial=1)
    f = jax.jit(jax.shard_map(lambda x: jax.lax.psum(x, DATA_AXIS),
                              mesh=mesh, in_specs=P(DATA_AXIS),
                              out_specs=P()))
    local = jnp.arange(n_global, dtype=jnp.float32)
    out = f(local)
    expected = float(sum(range(n_global)))
    got = float(np.asarray(out)[0])
    assert got == expected, (got, expected)

    # 2-D (data, spatial) mesh spanning processes constructs and shards.
    mesh2 = make_mesh(n_data=n_global // 2, n_spatial=2)
    assert mesh2.devices.shape == (n_global // 2, 2)
    print(f"proc {pid}: distributed psum over {n_global} global devices "
          f"across {nproc} processes ok")


if __name__ == "__main__":
    main()
