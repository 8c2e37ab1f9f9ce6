"""Worker process for the real 2-process jax.distributed test.

Launched by tests/test_distributed_multiprocess.py, one subprocess per
process_id. Each worker joins the coordination service, builds the GLOBAL
(batch x rows) mesh spanning both processes' CPU devices, runs
``sharded_remap_step`` on a globally-sharded batch, and checks its
addressable output shards against a locally-computed single-process
reference. Prints ``DISTRIBUTED_OK`` on success (the test asserts it).

SURVEY.md §5.8: this is the multi-host entry (jax.distributed.initialize
+ global mesh + XLA collectives) exercised end-to-end, not monkeypatched
— the CPU twin of a 2-host pod run.
"""

import argparse
import os
import sys

# 4 virtual CPU devices per process -> 8 global devices over 2 processes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    args = ap.parse_args()

    import numpy as np

    from image_lens_reproject_tpu.models.lens import (
        Rectilinear,
        full_equirectangular,
    )
    from image_lens_reproject_tpu.ops import remap
    from image_lens_reproject_tpu.parallel import batch as pbatch
    from image_lens_reproject_tpu.parallel import distributed
    from image_lens_reproject_tpu.parallel.mesh import input_sharding

    active = distributed.init(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert active, "distributed.init did not report an active cluster"
    assert jax.process_count() == args.num_processes, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    print(f"proc {jax.process_index()}: {n_local} local / {n_global} global")
    assert n_global == args.num_processes * n_local

    # Global (batch=4, rows=2) mesh over both processes' devices.
    mesh = distributed.global_mesh(batch=4, rows=2)

    # Deterministic batch, identical in every process.
    batch_np = np.random.default_rng(11).random((4, 32, 64, 3)).astype(np.float32)
    in_lens = full_equirectangular()
    out_lens = Rectilinear(35.0, 36.0, 27.0)

    sharding = input_sharding(mesh)
    garr = jax.make_array_from_callback(
        batch_np.shape, sharding, lambda idx: batch_np[idx]
    )

    out = pbatch.sharded_remap_step(
        garr,
        None,
        mesh=mesh,
        in_lens=in_lens,
        out_lens=out_lens,
        out_h=36,  # non-divisible by rows=2 -> exercises band pad+crop
        out_w=64,
        interp="bilinear",
        n_samples=1,
    )

    # Single-process reference, computed locally.
    ref = np.asarray(
        remap.remap_batch_jit(
            batch_np,
            None,
            in_lens=in_lens,
            out_lens=out_lens,
            out_h=36,
            out_w=64,
            interp="bilinear",
            n_samples=1,
        )
    )

    # Each process validates the shards it can address.
    checked = 0
    for shard in out.addressable_shards:
        got = np.asarray(shard.data)
        want = ref[shard.index]
        np.testing.assert_allclose(got, want, atol=2e-5)
        checked += 1
    assert checked > 0
    print(f"proc {jax.process_index()}: checked {checked} shards DISTRIBUTED_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
