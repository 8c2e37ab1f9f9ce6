"""Per-op-class vector costs on the real chip (calibrates op_model.py).

Times small Pallas kernels that issue UNROLL x CHAINS identical
(8, 128)-vreg ops per loop trip — lane-dim gathers ((S, 128)
take_along_axis, the whole-window body's workhorse), sublane-dim
gathers ((8, L) axis=0, the scan body's workhorse), selects, FMAs, and
lane rolls — and reports ns per op. CHAINS independent dependency
chains give the VPU ILP, so the number approximates throughput cost,
not raw latency.

Tunnel methodology (CLAUDE.md): per-call dispatch is ~ms and only a
device->host FETCH syncs, so each op class is timed at two in-kernel
trip counts and the cost comes from the (big - small) difference —
dispatch/fetch overhead cancels.

The point: op_model.py's counts say the whole-window body should beat
the scan body ~5x on the headline, but it measures parity; the implied
lane-gather cost is ~5x an average vector op. This probe measures the
ratio directly so kernel-variant decisions (e.g. two-step gather
factorizations) can be made from per-op costs instead of guesses.

Usage: python bench/gather_cost_probe.py  (real chip; one JSON line/op)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

SMALL = 2048
BIG = 65536
UNROLL = 16      # ops per chain per trip
CHAINS = 4       # independent dependency chains (ILP)
REPS = 5


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make_kernel(op_name, iters):
        def kernel(x_ref, idx_ref, out_ref):
            xs = tuple(x_ref[0] + jnp.float32(i) for i in range(CHAINS))
            idx = idx_ref[0]
            idx8 = idx % 8

            def body(i, xs):
                out = list(xs)
                for c in range(CHAINS):
                    v = out[c]
                    for _ in range(UNROLL):
                        if op_name == "lane_gather":
                            v = jnp.take_along_axis(v, idx, axis=1)
                        elif op_name == "sublane_gather":
                            v = jnp.take_along_axis(v, idx8, axis=0)
                        elif op_name == "select":
                            v = jnp.where(idx > 64, v, v + 1.0)
                        elif op_name == "fma":
                            v = v * 1.000001 + 0.5
                        elif op_name == "lane_roll":
                            v = pltpu.roll(v, 1, 1)
                        else:
                            raise ValueError(op_name)
                    # fold the trip counter in so the chain cannot be
                    # hoisted out of the loop
                    out[c] = v + i.astype(jnp.float32) * 1e-30
                return tuple(out)

            xs = jax.lax.fori_loop(0, iters, body, xs)
            acc = xs[0]
            for c in range(1, CHAINS):
                acc = acc + xs[c]
            out_ref[...] = acc

        return kernel

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 8, 128)).astype(np.float32))
    # f32 gather indices must live in a separate int input; permutation
    # pattern exercises arbitrary lanes
    perm = (np.arange(128, dtype=np.int32) * 37) % 128
    idx = jnp.asarray(np.broadcast_to(perm, (1, 8, 128)).copy())

    results = {}
    for op in ("fma", "select", "lane_roll", "sublane_gather",
               "lane_gather"):
        times = {}
        for iters in (SMALL, BIG):
            f = pl.pallas_call(
                make_kernel(op, iters),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )

            def run():
                out = f(x, idx)
                return float(np.asarray(out)[0, 0])  # fetch = real sync

            run()  # compile + first-fetch handshake
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            times[iters] = best
        n_ops = (BIG - SMALL) * UNROLL * CHAINS
        ns = (times[BIG] - times[SMALL]) / n_ops * 1e9
        results[op] = ns
        print(json.dumps({
            "op": op, "ns_per_vreg_op": round(ns, 4),
            "t_small_s": round(times[SMALL], 4),
            "t_big_s": round(times[BIG], 4),
        }), flush=True)
    base = results.get("fma")
    if base and base > 0:
        rel = {k: round(v / base, 2) for k, v in results.items()}
        print(json.dumps({"relative_to_fma": rel}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
