"""Micro-benchmark: XLA gather formulations on TPU for the remap inner loop.

The remap's only memory-bound op is the per-tap gather. This sweep measures
candidate formulations so the fastest becomes the production layout:

  A. rows-of-(N,C):    take(src.reshape(H*W, C), idx, axis=0)   (current)
  B. planar-lanes:     take(src_planar (C, H*W), idx, axis=1)
  C. one-hot matmul:   (only for tiny windows; skipped at full size)
  D. rows-padded-C8:   like A but C padded to 8
  E. linearized bilinear: 4 gathers vs fused weighted single pass

Timing uses the fetch-sync protocol (see bench.py): chained dependent
iterations closed by a small device->host fetch, minus measured fetch
overhead.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(fn, dep_init, iters, overhead, fetch):
    out = fn(dep_init)  # compile/warm
    fetch(out)
    t0 = time.perf_counter()
    dep = dep_init
    for _ in range(iters):
        out = fn(dep)
        dep = out.reshape(-1)[0]
    fetch(out)
    dt = time.perf_counter() - t0 - overhead
    return max(dt, 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    H, W, C = 1920, 3840, 3
    OH, OW = 2160, 3840
    N = OH * OW
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 1, size=(H, W, C)).astype(np.float32)
    # Smooth-ish indices emulating a lens remap access pattern.
    yy, xx = np.meshgrid(
        np.linspace(0, H - 2, OH).astype(np.int32),
        np.linspace(0, W - 2, OW).astype(np.int32),
        indexing="ij",
    )
    flat_idx = (yy * W + xx).astype(np.int32)

    src_rows = jnp.asarray(src.reshape(H * W, C))
    src_planar = jnp.asarray(np.ascontiguousarray(src.reshape(H * W, C).T))
    src_pad8 = jnp.asarray(
        np.concatenate([src.reshape(H * W, C), np.zeros((H * W, 5), np.float32)], axis=1)
    )
    idx = jnp.asarray(flat_idx)

    def fetch(arr):
        return np.asarray(arr.reshape(-1)[:4])

    @jax.jit
    def warm(d):
        return jnp.sum(src_rows[:8]) + d

    w = warm(jnp.float32(0))
    t0 = time.perf_counter()
    fetch(w)
    print(f"first fetch: {time.perf_counter()-t0:.1f}s", flush=True)
    ovh = []
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(w)
        ovh.append(time.perf_counter() - t0)
    overhead = float(np.median(ovh))
    print(f"fetch overhead: {overhead:.3f}s", flush=True)

    iters = 30
    results = {}

    @jax.jit
    def f_rows(d):
        return jnp.take(src_rows, idx + d.astype(jnp.int32) * 0, axis=0)

    dt = timed(f_rows, jnp.float32(0), iters, overhead, fetch)
    results["A rows (N,3) take axis0"] = N * iters / dt / 1e6

    @jax.jit
    def f_planar(d):
        return jnp.take(src_planar, idx + d.astype(jnp.int32) * 0, axis=1)

    dt = timed(f_planar, jnp.float32(0), iters, overhead, fetch)
    results["B planar (3,N) take axis1"] = N * iters / dt / 1e6

    @jax.jit
    def f_pad8(d):
        return jnp.take(src_pad8, idx + d.astype(jnp.int32) * 0, axis=0)

    dt = timed(f_pad8, jnp.float32(0), iters, overhead, fetch)
    results["D rows (N,8) take axis0"] = N * iters / dt / 1e6

    # E: single-channel gather (is C the problem?)
    src_1c = jnp.asarray(np.ascontiguousarray(src[:, :, 0].reshape(-1)))

    @jax.jit
    def f_1c(d):
        return jnp.take(src_1c, idx + d.astype(jnp.int32) * 0, axis=0)

    dt = timed(f_1c, jnp.float32(0), iters, overhead, fetch)
    results["E flat 1-channel take"] = N * iters / dt / 1e6

    # F: 2D gather per (y,x) planes with take over rows of (H, W) one channel
    src_hw = jnp.asarray(src[:, :, 0])
    yyj = jnp.asarray(yy)
    xxj = jnp.asarray(xx)

    @jax.jit
    def f_2d(d):
        return src_hw[yyj + d.astype(jnp.int32) * 0, xxj]

    dt = timed(f_2d, jnp.float32(0), iters, overhead, fetch)
    results["F advanced-index (y,x) 1ch"] = N * iters / dt / 1e6

    for k, v in results.items():
        print(f"{k:32s}: {v:9.1f} Mgather/s", flush=True)


if __name__ == "__main__":
    main()
