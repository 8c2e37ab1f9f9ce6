"""Probe: dynamic-shift pltpu.roll on the LANE axis (real chip).

The DMA-fetch kernel design needs to realign a 128-lane-aligned fetched
window to its true (arbitrary) start lane: roll axis=1 by a per-tile
dynamic shift. The current kernel only ever dynamic-rolls the SUBLANE
axis; this probes the lane-axis variant for (a) compile, (b) correctness
vs numpy (incl. the known hazard: dynamic NEGATIVE shifts miscompile on
hardware — probe uses positive equivalents), (c) cost.

Usage: python bench/roll_probe.py [--interpret]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

H, W = 80, 256


def build(interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(sh_s, in_ref, out_ref):
        t = pl.program_id(0)
        sh = sh_s[0, t]
        # roll left by sh == roll right by W - sh (positive shift only)
        out_ref[0] = pltpu.roll(in_ref[0], W - sh, 1)

    def run(x, shifts):
        n = shifts.shape[1]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, H, W), lambda t, s: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, W), lambda t, s: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, H, W), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(shifts, x)

    return run


def main() -> int:
    interpret = "--interpret" in sys.argv
    if interpret:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 32
    x = rng.random((n, H, W), np.float32)
    shifts = rng.integers(0, 128, (1, n)).astype(np.int32)
    shifts[0, 0] = 0
    shifts[0, 1] = 127
    shifts[0, 2] = 1

    run = build(interpret)
    out = np.asarray(run(jnp.asarray(x), jnp.asarray(shifts)))
    want = np.stack([np.roll(x[i], -int(shifts[0, i]), axis=1) for i in range(n)])
    err = np.abs(out - want).max()
    print(f"dynamic lane roll: max err {err:.2e} {'OK' if err == 0 else 'FAIL'}")

    if not interpret:
        big = 2048
        # generate on-device: H2D over the tunnel is ~40 MB/s
        ii = jax.lax.broadcasted_iota(jnp.float32, (big, H, W), 0)
        jj = jax.lax.broadcasted_iota(jnp.float32, (big, H, W), 2)
        xb = jax.jit(lambda: jnp.sin(ii * 0.37 + jj * 0.11))()
        sb = jnp.asarray(rng.integers(0, 128, (1, big)).astype(np.int32))
        f = jax.jit(lambda a, s: run(a, s).sum())
        r = f(xb, sb)
        np.asarray(r)
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            r = f(xb + r * 1e-12, sb)
        np.asarray(r)
        dt = time.perf_counter() - t0
        print(f"lane roll (80,256): {dt / iters / big * 1e9:.0f} ns/tile")
    return 0


if __name__ == "__main__":
    sys.exit(main())
