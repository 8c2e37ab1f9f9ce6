"""Micro-benchmark: XLA gather formulations on TPU for the patch sampler.

The hybrid patch's only memory-bound op is the per-tap gather. This sweep
measures candidate formulations so the fastest becomes the production
layout. All operands are passed as jit ARGUMENTS (closure constants are
inlined into the remote-compile payload and trip its HTTP 413 size cap).

Timing uses the fetch-sync protocol (see bench.py): chained dependent
iterations closed by a small device->host fetch, minus measured fetch
overhead. Results print incrementally (one line per variant).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


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
    idx = jnp.asarray(flat_idx)

    def fetch(arr):
        return np.asarray(arr.reshape(-1)[:4])

    def timed(fn, args, iters):
        out = fn(jnp.float32(0), *args)  # compile/warm
        fetch(out)
        t0 = time.perf_counter()
        dep = jnp.float32(0)
        for _ in range(iters):
            out = fn(dep, *args)
            dep = out.reshape(-1)[0]
        fetch(out)
        return max(time.perf_counter() - t0 - overhead, 1e-9)

    @jax.jit
    def warm(d, s):
        return jnp.sum(s[:8]) + d

    src_rows = jnp.asarray(src.reshape(H * W, C))
    w = warm(jnp.float32(0), src_rows)
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

    iters = 20

    def report(name, dt):
        print(f"{name:34s}: {N * iters / dt / 1e6:9.1f} Mgather/s", flush=True)

    @jax.jit
    def f_rows(d, s, i):
        return jnp.take(s, i + d.astype(jnp.int32) * 0, axis=0)

    report("A rows (N,3) take axis0", timed(f_rows, (src_rows, idx), iters))

    src_planar = jnp.asarray(np.ascontiguousarray(src.reshape(H * W, C).T))

    @jax.jit
    def f_planar(d, s, i):
        return jnp.take(s, i + d.astype(jnp.int32) * 0, axis=1)

    report("B planar (3,N) take axis1", timed(f_planar, (src_planar, idx), iters))

    src_pad8 = jnp.asarray(
        np.concatenate([src.reshape(H * W, C), np.zeros((H * W, 5), np.float32)], axis=1)
    )

    @jax.jit
    def f_pad8(d, s, i):
        return jnp.take(s, i + d.astype(jnp.int32) * 0, axis=0)

    report("D rows (N,8) take axis0", timed(f_pad8, (src_pad8, idx), iters))

    src_1c = jnp.asarray(np.ascontiguousarray(src[:, :, 0].reshape(-1)))

    @jax.jit
    def f_1c(d, s, i):
        return jnp.take(s, i + d.astype(jnp.int32) * 0, axis=0)

    report("E flat 1-channel take", timed(f_1c, (src_1c, idx), iters))

    src_hw = jnp.asarray(src[:, :, 0])
    yyj = jnp.asarray(yy)
    xxj = jnp.asarray(xx)

    @jax.jit
    def f_2d(d, s, y, x):
        return s[y + d.astype(jnp.int32) * 0, x]

    report("F advanced-index (y,x) 1ch", timed(f_2d, (src_hw, yyj, xxj), iters))

    # G: 3 per-channel flat takes (planar source, separate gathers) —
    # does splitting channels beat the (N, C) row gather?
    src_3flat = tuple(
        jnp.asarray(np.ascontiguousarray(src[:, :, c].reshape(-1))) for c in range(C)
    )

    @jax.jit
    def f_3flat(d, s0, s1, s2, i):
        ii = i + d.astype(jnp.int32) * 0
        return jnp.stack([jnp.take(s0, ii, axis=0),
                          jnp.take(s1, ii, axis=0),
                          jnp.take(s2, ii, axis=0)], axis=-1)

    report("G 3x flat per-channel takes", timed(f_3flat, (*src_3flat, idx), iters))

    # H: ONE fused take for all 4 bilinear taps x 3 channels (12N flat
    # element indices in a single gather op) — does op count or element
    # count dominate?
    idx4 = jnp.stack([idx, idx + 1, idx + W, idx + W + 1])  # (4, OH, OW)

    @jax.jit
    def f_alltaps(d, s, i4):
        ii = (i4 + d.astype(jnp.int32) * 0).reshape(-1)
        return jnp.take(s, ii, axis=0)  # (4*N, C)

    report("H one take, 4 taps x (N,3) rows", timed(f_alltaps, (src_rows, idx4), iters))


if __name__ == "__main__":
    main()
