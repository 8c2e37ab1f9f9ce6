"""Map the compact rescue launch's scoped-VMEM feasibility on real hardware.

The pass-2 rescue kernel (remap_kernel.py, compact whole-window launch)
unrolls ng*8 gather rows x channels*taps*(g-1 chained selects) per
sub-tile; the Mosaic compiler's scoped-VMEM stack grows with that unroll
and hard-fails past 16 MiB ("Ran out of memory in memory space vmem ...
scoped allocation"). Round 3 landed the (12, 8)/(16, 8) RESCUE_LADDER
entries blind during the relay outage; the round-4 battery caught
(ng=12, g=8, C=4, bilinear) OOMing at 22.8M on the first real compile.

This probe AOT-compiles (never runs) the rescue launch for a grid of
(ng, g, channels, interp) on the real chip and prints one JSON line per
combo: {"ng", "g", "channels", "interp", "score", "ok", "error"}.
``score = ng*8 * channels * taps * g`` is a rough size proxy (the
measured boundary is NOT a single score threshold — e.g. (12,6,4,bl)
s=4608 compiles while (12,8,3,bl) s=4608 OOMs); the measured OK/FAIL
anchors land in remap_kernel._RESCUE_VMEM_OK / rescue_feasible, which
extends them by componentwise dominance. Extend the grid here before
admitting any new (ng, g, C, taps) corner.

Usage: python bench/rescue_vmem_probe.py [ng:g:C:interp ...]
(defaults to a boundary-bracketing grid).
"""

from __future__ import annotations

import json
import math
import sys
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np

DEFAULT_GRID = [
    # (ng, g, channels, interp) — brackets the known PASS (12,6,3,bl;
    # 8,6,3,bc from the battery) .. FAIL (12,8,4,bl @ 22.8M) boundary
    # and covers the production-relevant corners (RGBZ/RGBAZ, bicubic).
    (8, 6, 4, "bilinear"),
    (8, 6, 4, "bicubic"),
    (8, 6, 5, "bicubic"),
    (12, 6, 4, "bilinear"),
    (12, 6, 4, "bicubic"),
    (12, 6, 3, "bicubic"),
    (12, 8, 3, "bilinear"),
    (12, 8, 4, "bilinear"),
    (16, 8, 3, "bilinear"),
    (16, 8, 3, "nearest"),
]


def main() -> int:
    import jax
    import jax.numpy as jnp

    from image_lens_reproject_tpu.models.lens import FisheyeEquisolid, Rectilinear
    from image_lens_reproject_tpu.ops.pallas import remap_kernel as RK

    grid = []
    for a in sys.argv[1:]:
        ng, g, c, interp = a.split(":")
        grid.append((int(ng), int(g), int(c), interp))
    if not grid:
        grid = DEFAULT_GRID

    in_lens = Rectilinear(50.0, 36.0, 36.0)
    out_lens = FisheyeEquisolid(15.0, math.pi, 36.0, 36.0)
    taps_of = {"nearest": 1, "bilinear": 2, "bicubic": 4}

    for ng, g, c, interp in grid:
        src = np.zeros((512, 512, c), np.float32)
        rec = {"ng": ng, "g": g, "channels": c, "interp": interp,
               "score": ng * 8 * c * taps_of[interp] * g}

        def f(s):
            return RK.remap_pallas(
                s, None, in_lens=in_lens, out_lens=out_lens,
                out_h=512, out_w=512, interp=interp, tile_rows=24,
                n_groups=1, rb=16, rescue_cap=128, rescue_budgets=(ng, g),
            )

        try:
            jax.jit(f).lower(jnp.asarray(src)).compile()
            rec["ok"] = True
        except Exception as e:  # compile-time OOM / Mosaic crash
            rec["ok"] = False
            msg = str(e)
            if "scoped" in msg.lower() or "vmem" in msg.lower():
                # keep the size line for fitting
                line = [l for l in msg.splitlines() if "Scoped allocation" in l]
                rec["error"] = line[0].strip() if line else msg[:200]
            else:
                rec["error"] = msg[:200]
                traceback.print_exc()
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
