"""Static vector-op counts for the remap kernel bodies (floor analysis).

Counts the (8, 128)-vreg operations the scan and whole-window kernel
bodies issue per output tile, from the kernel's actual loop structure
(ops/pallas/remap_kernel.py:_make_kernel), and normalizes to ops/pixel.
Combined with measured Mpix/s from bench/cfg_probe.py / bench/ww_sweep.py
this yields the effective ns-per-vreg-op for each body. NOTE: these
counts are RELATIVE cost structure, not a literal floor — the measured
headline (1474 Mpix/s at ~1.7 scan ops/px) implies the v5e VPU retires
~2.7 of these logical ops per cycle on the scan body, while the
whole-window body's ~5x fewer ops measured only parity (1358 vs 1361),
implying its lane-dim gathers cost ~5x an average vector op. The model's
use: predict whether an op-count change CAN win before burning chip
time, and turn probe rates into per-op-class costs.

Usage: python bench/op_model.py            # table for the five configs
       python bench/op_model.py 3 1400     # + implied ns/op at 1400 Mpix/s
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

TC = 128
VPU_GHZ = 0.94


def scan_body_ops(tile_rows, ng, rb, su, taps, c, scanned_cols):
    """Vreg ops per tile for the SCAN body (remap_kernel.py body())."""
    n_sub = tile_rows // 8
    # Per scan step: one lane roll of the fetched window plus one
    # sublane roll per sub-tile (each roll moves a (2*rb, SU*C) value —
    # count it as its vreg footprint), plus y_rel/loc clips per
    # (tap, sub-tile).
    roll_vregs = max(1, (2 * rb) * (su * c) // (8 * TC))
    per_step = roll_vregs + n_sub * roll_vregs + n_sub * taps * 2
    mask_ops = 0 if ng == 1 else n_sub * ng * taps * 2  # wrow where-chains
    per_col = n_sub * (taps * 3 - 1)          # colw: cmp+sel per tap + adds
    per_col += c * n_sub * (
        1                       # column slice
        + ng                    # broadcast per group
        + ng * taps * 2         # sublane gather + FMA
        + 1                     # acc FMA with colw
    )
    n_steps = max(1, scanned_cols // su)
    return n_steps * (per_step + mask_ops) + scanned_cols * per_col


def ww_body_ops(tile_rows, ng, g, taps, c):
    """Vreg ops per tile for the WHOLE-WINDOW body (gchunks variant)."""
    n_sub = tile_rows // 8
    per_sub = 1 + taps * 2  # window roll + y_rel clips + xli muls
    per_j = (
        taps * 3 - 1        # mj mask chain
        + 1 + g             # row slice + chunk broadcasts
        + c * (taps * (1 + (g - 1) * 2)   # gathers + chained selects
               + taps                      # weight FMAs
               + 1)                        # acc FMA
    )
    return n_sub * (per_sub + ng * 8 * per_j)


def rescue_ops_per_subtile(ng, g, taps, c):
    return ww_body_ops(8, ng, g, taps, c)


def main() -> int:
    configs = {
        1: dict(tile=(48, 1, 16, 32), taps=2, c=3, cols=40, out=(1080, 1920)),
        2: dict(tile=(32, 2, 40, 32), taps=2, c=3, cols=64, out=(2048, 4096)),
        3: dict(tile=(48, 1, 16, 32), taps=4, c=3, cols=40, out=(2160, 3840)),
        4: dict(tile=(16, 1, 16, 32), taps=2, c=4, cols=40, out=(2048, 2048)),
    }
    for n, cfg in configs.items():
        tr, ng, rb, su = cfg["tile"]
        px = tr * TC
        scan = scan_body_ops(tr, ng, rb, su, cfg["taps"], cfg["c"], cfg["cols"])
        ww_g = max(1, -(-cfg["cols"] * cfg["c"] // 128))
        ww = ww_body_ops(tr, ng, ww_g, cfg["taps"], cfg["c"])
        line = {
            "cfg": n, "tile": cfg["tile"],
            "scan_ops_per_px": round(scan / px, 2),
            "ww_ops_per_px": round(ww / px, 2),
            "ww_chunks": ww_g,
            "mpix_s_at_1op_per_cycle_scan": round(
                1000.0 / (scan / px / VPU_GHZ), 0),
            "mpix_s_at_1op_per_cycle_ww": round(
                1000.0 / (ww / px / VPU_GHZ), 0),
        }
        if len(sys.argv) > 2 and int(sys.argv[1]) == n:
            measured = float(sys.argv[2])
            line["implied_ns_per_op_scan"] = round(
                (1000.0 / measured) / (scan / px), 3)
        print(json.dumps(line))
    for ng, g in ((8, 6), (12, 6), (12, 8), (16, 8)):
        for c, taps in ((3, 2), (4, 2), (3, 4)):
            ops = rescue_ops_per_subtile(ng, g, taps, c)
            print(json.dumps({
                "rescue_budget": [ng, g], "channels": c, "taps": taps,
                "ops_per_px": round(ops / 1024, 2),
                "modeled_ns_per_px_at_1.3": round(ops / 1024 * 1.3, 1),
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
