#!/usr/bin/env python
"""Multi-process distributed smoke: 2 processes x 4 virtual CPU devices.

Covers the multi-host init path (``jax.distributed.initialize`` + a
global mesh spanning processes) that the in-process 8-device dryrun
cannot (VERDICT r4 missing #4 / next #5; SURVEY §5 backend row).  Each
process builds the same row partition, assembles GLOBAL arrays with
``jax.make_array_from_callback``, runs the sharded SpMM forward and a
gradient step of a toy loss through the halo ``all_to_all``, and
process 0 compares against the single-process XLA oracle.

Run as:  python scripts/run_multiproc.py <process_id> <coordinator>
(the pytest wrapper in tests/test_multiproc.py spawns both).  Prints
``MULTIPROC OK`` on success, ``MULTIPROC_SKIP: <reason>`` when the
environment cannot run multi-process CPU collectives.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    pid = int(sys.argv[1])
    coord = sys.argv[2]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # noqa: BLE001 — older/newer flag name: try default
        pass
    try:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=2, process_id=pid)
    except Exception as e:  # noqa: BLE001
        print(f"MULTIPROC_SKIP: distributed init failed: {e!r}",
              flush=True)
        return 0

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) != 8 or jax.process_count() != 2:
        print(f"MULTIPROC_SKIP: got {len(jax.devices())} devices / "
              f"{jax.process_count()} processes", flush=True)
        return 0

    from isplib_tpu.dist.partition import partition_rows
    from isplib_tpu.dist.spmm_dist import spmm_sharded

    # deterministic small graph, identical in both processes
    rng = np.random.default_rng(7)
    n, e, k = 512, 4096, 16
    row = np.sort(rng.integers(0, n, e))
    col = rng.integers(0, n, e)
    val = rng.normal(size=e).astype(np.float32)
    x_np = rng.normal(size=(n, k)).astype(np.float32)

    sg_host = partition_rows(row, col, val, n, num_shards=8,
                             device=False)
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))

    def to_global(a):
        a = np.asarray(a)
        shard = NamedSharding(mesh, P("data", *([None] * (a.ndim - 1))))
        return jax.make_array_from_callback(
            a.shape, shard, lambda idx: a[idx])

    import dataclasses
    sg = dataclasses.replace(
        sg_host,
        **{f: to_global(getattr(sg_host, f))
           for f in ("row_loc", "col_loc", "val_loc", "row_halo",
                     "col_halo", "val_halo", "deg", "send_ids")})
    total = sg.num_shards * sg.rows_per_shard
    x_pad = np.zeros((total, k), np.float32)
    x_pad[:n] = x_np
    xg = to_global(x_pad)

    @jax.jit
    def fwd(s_, x_):
        return spmm_sharded(s_, x_, reduce="sum", mesh=mesh)

    @jax.jit
    def gstep(s_, x_):
        return jax.grad(
            lambda xx: 0.5 * jnp.sum(
                spmm_sharded(s_, xx, reduce="sum", mesh=mesh) ** 2))(x_)

    out = fwd(sg, xg)
    gx = gstep(sg, xg)
    from jax.experimental import multihost_utils
    out_l = np.asarray(multihost_utils.process_allgather(out, tiled=True))
    gx_l = np.asarray(multihost_utils.process_allgather(gx, tiled=True))

    # single-process oracle (plain numpy)
    a = np.zeros((n, n), np.float32)
    np.add.at(a, (row, col), val)
    want = a @ x_np
    want_g = a.T @ want
    np.testing.assert_allclose(out_l[:n], want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(gx_l[:n], want_g, rtol=2e-4, atol=2e-4)
    if pid == 0:
        print("MULTIPROC OK", flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
