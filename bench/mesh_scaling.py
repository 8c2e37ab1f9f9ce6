"""Sharding-overhead curve for the multi-chip step on a virtual CPU mesh.

Real multi-chip hardware is not available in this environment, so this
probe measures what a CPU mesh CAN measure: the *overhead* the sharded
program adds over the single-device program when the same total work is
split over N virtual devices that time-slice one host core. On real ICI
the per-device compute drops ~1/N while these overheads (all_gather of
source row bands, shard_map bookkeeping, band padding) stay — so
"wall(mesh) / wall(1 device)" on the serialized host bounds the fraction
of the step that is sharding machinery rather than remap work
(SURVEY.md §5.7-5.8; VERDICT r3 next-round #7).

Run under the test environment:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench/mesh_scaling.py
Prints one JSON line per mesh shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BATCH = 8
SRC_H, SRC_W = 512, 1024
OUT_H, OUT_W = 512, 512
INTERP = "bicubic"
REPS = 5


def main() -> int:
    from image_lens_reproject_tpu.models.lens import (
        Rectilinear, full_equirectangular,
    )
    from image_lens_reproject_tpu.models.rotation import rotation_matrix_degrees
    from image_lens_reproject_tpu.parallel import batch as pbatch
    from image_lens_reproject_tpu.parallel import mesh as pmesh

    in_lens = full_equirectangular()
    out_lens = Rectilinear(35.0, 36.0, 36.0)
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 2, (BATCH, SRC_H, SRC_W, 3)).astype(np.float32)
    rot = jnp.asarray(rotation_matrix_degrees(20.0, 5.0, 0.0))

    n_dev = len(jax.devices())
    shapes = [(1, 1), (2, 1), (4, 1), (8, 1), (1, 2), (1, 4), (1, 8), (4, 2)]
    base_s = None
    for b_ax, r_ax in shapes:
        if b_ax * r_ax > n_dev:
            continue
        mesh = pmesh.make_mesh(
            devices=jax.devices()[: b_ax * r_ax], batch=b_ax, rows=r_ax
        )
        sharded = pbatch.shard_batch(jnp.asarray(src), mesh)

        def step(s):
            return pbatch.sharded_remap_step(
                s, rot, mesh=mesh, in_lens=in_lens, out_lens=out_lens,
                out_h=OUT_H, out_w=OUT_W, interp=INTERP, n_samples=1,
                exposure=2.0, reinhard=4.0,
            )

        out = jax.block_until_ready(step(sharded))  # compile
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = jax.block_until_ready(step(sharded))
            times.append(time.perf_counter() - t0)
        wall = float(np.median(times))
        if base_s is None:
            base_s = wall
        print(json.dumps({
            "mesh": f"{b_ax}x{r_ax}",
            "devices": b_ax * r_ax,
            "wall_s": round(wall, 4),
            # serialized-host overhead vs the 1-device program; on real
            # chips compute is 1/N of this wall while the overhead stays.
            "overhead_vs_1dev": round(wall / base_s, 3),
            "mpix_s_serialized_host": round(
                BATCH * OUT_H * OUT_W / wall / 1e6, 1
            ),
            "checksum": round(float(jnp.mean(out)), 6),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
