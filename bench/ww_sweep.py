"""Sweep whole-window kernel configs (scan_unroll < 0) on the headline.

Times the headline config (4K equirect->rect bicubic+tonemap) for each
(tile_rows, n_groups, rb, scan_unroll, cb) tuple given on the command
line as colon-joined ints, e.g.:

    python bench/ww_sweep.py 32:1:40:-1:256 64:1:24:-1:256 32:1:40:32:256

Prints one JSON line per config (chained iterations, fetch-overhead
subtracted — same methodology as bench.py).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

SRC_H, SRC_W = 1920, 3840
OUT_H, OUT_W = 2160, 3840
INTERP = "bicubic"
ITERS = 30
REPS = 3


def main() -> int:
    import jax
    import jax.numpy as jnp

    from image_lens_reproject_tpu.models.lens import (
        Rectilinear, full_equirectangular,
    )
    from image_lens_reproject_tpu.models.rotation import rotation_matrix_degrees
    from image_lens_reproject_tpu.ops import remap_fused

    in_lens = full_equirectangular()
    out_lens = Rectilinear(35.0, 36.0, 36.0 * OUT_H / OUT_W)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(0, 2, size=(SRC_H, SRC_W, 3)).astype(np.float32))
    rot = jnp.asarray(rotation_matrix_degrees(20.0, 5.0, 0.0))

    configs = []
    for a in sys.argv[1:]:
        tr, ng, rb, su, cb = (int(x) for x in a.split(":"))
        configs.append((tr, ng, rb, su, cb))
    if not configs:
        configs = [(32, 1, 40, -1, 256)]

    overhead = None
    for tr, ng, rb, su, cb in configs:
        try:
            scalars, bad = remap_fused.make_plan(
                rot, in_lens=in_lens, out_lens=out_lens, in_h=SRC_H,
                in_w=SRC_W, out_h=OUT_H, out_w=OUT_W, interp=INTERP,
                n_samples=1, tile_rows=tr, n_groups=ng, rb=rb,
                scan_unroll=su, cb=cb, channels=3,
            )
            frac_bad = float(jnp.mean(bad.astype(jnp.float32)))

            @jax.jit
            def chain(src_, seed, _s=scalars, _b=bad, _tr=tr, _ng=ng,
                      _rb=rb, _su=su, _cb=cb):
                return remap_fused.remap_tonemap_planned(
                    src_ + seed * jnp.float32(1e-12), rot, _s, _b,
                    in_lens=in_lens, out_lens=out_lens, out_h=OUT_H,
                    out_w=OUT_W, interp=INTERP, n_samples=1, exposure=2.0,
                    reinhard=4.0, tile_rows=_tr, n_groups=_ng, rb=_rb,
                    scan_unroll=_su, cb=_cb,
                )

            out = chain(src, jnp.float32(0.0))
            np.asarray(out[0, :1, 0])  # handshake + compile
            if overhead is None:
                ohs = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(out[0, :1, 0])
                    ohs.append(time.perf_counter() - t0)
                overhead = float(np.median(ohs))
            rates = []
            for _ in range(REPS):
                seed = jnp.float32(0.0)
                t0 = time.perf_counter()
                for _ in range(ITERS):
                    out = chain(src, seed)
                    seed = out[0, 0, 0]
                np.asarray(out[0, :1, 0])
                dt = time.perf_counter() - t0 - overhead
                rates.append(OUT_H * OUT_W * ITERS / dt / 1e6)
            steady = rates[1:] if len(rates) > 1 else rates
            print(json.dumps({
                "tile_rows": tr, "n_groups": ng, "rb": rb, "scan_unroll": su,
                "cb": cb, "mpix_s": round(float(np.median(steady)), 1),
                "reps": [round(r, 1) for r in rates],
                "frac_bad_tiles": round(frac_bad, 4),
            }), flush=True)
        except Exception as e:  # keep sweeping past compile failures
            print(json.dumps({
                "tile_rows": tr, "n_groups": ng, "rb": rb, "scan_unroll": su,
                "cb": cb, "error": f"{type(e).__name__}: {e}"[:200],
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
