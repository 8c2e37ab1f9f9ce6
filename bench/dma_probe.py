"""Probe: in-kernel async DMA windows as a replacement for width-1 reads.

The scan kernel's measured floor is the per-column fetch primitive (~70
cycles per width-1 dynamic sublane read + relayout; docs/PERFORMANCE.md).
This probe validates the alternative on this toolchain BEFORE a kernel
rewrite: keep the padded source in HBM (memory_space ANY), and per tile
DMA the exact (H_WIN, W_WIN) window at DYNAMIC offsets (from scalar
prefetch) into VMEM scratch, then read it with static indexing.

Checks, in order:
  1. interpret-mode correctness (CPU);
  2. real-chip compile + correctness (Mosaic lowering of dynamic-offset
     DMA from ANY-space refs, arbitrary sublane/lane alignment);
  3. real-chip timing: per-step DMA issue+wait cost vs the width-1 read
     loop, double-buffered across tiles.

Usage: python bench/dma_probe.py [--interpret]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

H_WIN = 16   # window rows (per-sub-tile group span analog)
W_WIN = 128  # window lanes (SU * C analog)


def build(interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(offs_s, src_ref, out_ref, scratch, sem):
        t = pl.program_id(0)
        r0 = pl.multiple_of(offs_s[t, 0], 8)
        c0 = offs_s[t, 1]
        dma = pltpu.make_async_copy(
            src_ref.at[pl.ds(r0, H_WIN), pl.ds(c0, W_WIN)],
            scratch,
            sem,
        )
        dma.start()
        dma.wait()
        out_ref[0] = scratch[:] * 2.0

    def run(src, offs):
        n_tiles = offs.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, H_WIN, W_WIN), lambda t, s: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((H_WIN, W_WIN), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_tiles, H_WIN, W_WIN), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(offs, src)

    return run


def build_db(interpret: bool, n_steps: int):
    """Double-buffered variant: per tile, scan n_steps windows, DMA for
    step i+1 issued before processing step i (the kernel-rewrite shape)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(offs_s, src_ref, out_ref, scratch, sem):
        t = pl.program_id(0)
        r0 = offs_s[t, 0]
        c0 = offs_s[t, 1]

        def get_dma(slot, step):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(pl.multiple_of(r0 + step * 8, 8), H_WIN),
                           pl.ds(c0 + step * W_WIN, W_WIN)],
                scratch.at[slot],
                sem.at[slot],
            )

        get_dma(0, 0).start()

        def body(i, acc):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_steps)
            def _():
                get_dma(nxt, i + 1).start()

            get_dma(slot, i).wait()
            return acc + scratch[slot]

        acc = jax.lax.fori_loop(
            0, n_steps, body, jnp.zeros((H_WIN, W_WIN), jnp.float32)
        )
        out_ref[0] = acc

    def run(src, offs):
        n_tiles = offs.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, H_WIN, W_WIN), lambda t, s: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, H_WIN, W_WIN), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_tiles, H_WIN, W_WIN), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(offs, src)

    return run


def main() -> int:
    interpret = "--interpret" in sys.argv
    if interpret:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    H, W = 512, 1024
    src = rng.random((H, W), np.float32)
    n_tiles = 64
    offs = np.stack(
        [
            rng.integers(0, H - H_WIN - 64, n_tiles),
            rng.integers(0, W - W_WIN - 64, n_tiles),
        ],
        axis=1,
    ).astype(np.int32)
    # Mosaic requires DMA slice offsets divisible by the tiling in the
    # SUBLANE dim (8); probe lane-dim alignment with non-128 offsets.
    offs[:, 0] = (offs[:, 0] // 8) * 8
    offs[0] = (8, 5)
    offs[1] = (16, 129)

    run = build(interpret)
    out = np.asarray(run(jnp.asarray(src), jnp.asarray(offs)))
    want = np.stack(
        [2.0 * src[r: r + H_WIN, c: c + W_WIN] for r, c in offs]
    )
    err = np.abs(out - want).max()
    print(f"simple DMA window: max err {err:.2e} {'OK' if err == 0 else 'FAIL'}")

    n_steps = 4
    offs_db = offs.copy()
    offs_db[:, 0] = np.minimum(offs_db[:, 0], H - H_WIN - 8 * n_steps) // 8 * 8
    offs_db[:, 1] = np.minimum(offs_db[:, 1], W - n_steps * W_WIN)
    run_db = build_db(interpret, n_steps)
    out = np.asarray(run_db(jnp.asarray(src), jnp.asarray(offs_db)))
    want = np.stack(
        [
            sum(
                src[r + s * 8: r + s * 8 + H_WIN, c + s * W_WIN: c + s * W_WIN + W_WIN]
                for s in range(n_steps)
            )
            for r, c in offs_db
        ]
    )
    err = np.abs(out - want).max()
    print(f"double-buffered scan: max err {err:.2e} {'OK' if err < 1e-5 else 'FAIL'}")

    if not interpret:
        # Timing: per-DMA cost over many tiles (data-dependent chaining).
        big_tiles = 2048
        offs_b = np.stack(
            [
                rng.integers(0, H - H_WIN - 64, big_tiles),
                rng.integers(0, W - n_steps * W_WIN, big_tiles),
            ],
            axis=1,
        ).astype(np.int32)
        f = jax.jit(lambda s, o: run(s, o).sum())
        sj = jnp.asarray(src)
        oj = jnp.asarray(offs_b)
        r = f(sj, oj)
        np.asarray(r)
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            r = f(sj + r * 1e-12, oj)
        np.asarray(r)
        dt = time.perf_counter() - t0
        per_tile_ns = dt / iters / big_tiles * 1e9
        print(f"1-DMA tile: {per_tile_ns:.0f} ns/tile ({big_tiles} tiles)")

        fdb = jax.jit(lambda s, o: run_db(s, o).sum())
        r = fdb(sj, oj)
        np.asarray(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fdb(sj + r * 1e-12, oj)
        np.asarray(r)
        dt = time.perf_counter() - t0
        per_step_ns = dt / iters / big_tiles / n_steps * 1e9
        print(f"double-buffered: {per_step_ns:.0f} ns/step ({n_steps} steps/tile)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
