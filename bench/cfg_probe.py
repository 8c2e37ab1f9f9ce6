"""Probe one BASELINE config on the real chip with explicit tilings.

Usage: python bench/cfg_probe.py <cfg> tr:ng:rb:su:cb[:z[:r[:rng:rg[:p[:c]]]]] [...]
  cfg in {1, 2, 3, 4}   (see bench/baseline_configs.py)
  z=1: zero the bad mask (kernel-only rate; WRONG pixels — timing only)
  r=1: enable the pass-2 rescue (cap auto-sized from the plan)
  rng:rg: explicit rescue budgets (e.g. 12:6); defaults RESCUE_NG/G
  p=1: PIXEL-granular patch — the full product plan path
       (plan_with_rescue(pixel_patch=True): ladder-chosen budgets, so
       the explicit rng:rg fields are ignored; pass 0:0 placeholders)
  c=N: override the config's channel count (timing experiments — e.g.
       cfg4 z=1 at c=3 vs c=4 bounds the per-column channel share the
       4-channel lane-packing idea could recover)
  s=1: pass-2b SPLIT rescue — the full product plan path
       (plan_with_rescue(split=True): ladder-chosen budgets; the
       explicit rng:rg fields are ignored; pass placeholders)

Env ILR_PROBE_FORCE_PX=1 pins the px cost constant to ~0 before
planning so the cost-based admission cannot reject the pixel list —
REQUIRED when the probe's purpose is to MEASURE the px cost (otherwise
a fitted-constant rejection silently times the block path instead; the
JSON's pixel_patch field records what actually ran).

Prints one JSON line per tiling (chained iterations, fetch-overhead
subtracted). Use to iterate on a single config without re-timing all five.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

ITERS = 30
REPS = 3


def main() -> int:
    import jax
    import jax.numpy as jnp

    from image_lens_reproject_tpu.models.lens import (
        FisheyeEquidistant, FisheyeEquisolid, Rectilinear,
        full_equirectangular,
    )
    from image_lens_reproject_tpu.models.rotation import rotation_matrix_degrees
    from image_lens_reproject_tpu.ops import remap_fused

    import os
    if os.environ.get("ILR_PROBE_FORCE_PX") == "1":
        from image_lens_reproject_tpu.ops.pallas import remap_kernel as _RK
        _RK._PX_PATCH_NS_PER_PX = 1e-3

    cfg = int(sys.argv[1])
    tilings = []
    for a in sys.argv[2:]:
        parts = [int(x) for x in a.split(":")]
        tr, ng, rb, su, cb = parts[:5]
        zero_bad = bool(parts[5]) if len(parts) > 5 else False
        use_rescue = bool(parts[6]) if len(parts) > 6 else False
        budgets = (parts[7], parts[8]) if len(parts) > 8 and parts[7] else None
        pixel = bool(parts[9]) if len(parts) > 9 else False
        ch_over = parts[10] if len(parts) > 10 else 0
        split_probe = bool(parts[11]) if len(parts) > 11 else False
        tilings.append((tr, ng, rb, su, cb, zero_bad, use_rescue, budgets,
                        pixel, ch_over, split_probe))

    EQUIRECT = full_equirectangular()
    if cfg == 1:
        in_lens, out_lens = FisheyeEquidistant(math.pi, 36.0, 36.0), \
            Rectilinear(35.0, 36.0, 36.0 * 1080 / 1920)
        ih, iw, oh, ow, interp, rot_np, ch = 1080, 1080, 1080, 1920, "bilinear", None, 3
        exposure = reinhard = 1.0
    elif cfg == 2:
        in_lens, out_lens = FisheyeEquisolid(15.0, math.pi, 36.0, 36.0), EQUIRECT
        ih, iw, oh, ow, interp, ch = 2048, 2048, 2048, 4096, "bilinear", 3
        rot_np = rotation_matrix_degrees(30.0, 10.0, 5.0)
        exposure = reinhard = 1.0
    elif cfg == 3:
        in_lens, out_lens = EQUIRECT, Rectilinear(35.0, 36.0, 36.0 * 2160 / 3840)
        ih, iw, oh, ow, interp, ch = 1920, 3840, 2160, 3840, "bicubic", 3
        rot_np = rotation_matrix_degrees(20.0, 5.0, 0.0)
        exposure, reinhard = 2.0, 4.0
    elif cfg == 4:
        in_lens, out_lens = Rectilinear(50.0, 36.0, 36.0), \
            FisheyeEquisolid(15.0, math.pi, 36.0, 36.0)
        ih, iw, oh, ow, interp, rot_np, ch = 2048, 2048, 2048, 2048, "bilinear", None, 4
        exposure = reinhard = 1.0
    else:
        raise SystemExit(f"unknown cfg {cfg}")

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(0, 2, (ih, iw, ch)).astype(np.float32))
    rot = None if rot_np is None else jnp.asarray(rot_np)

    overhead = None
    for tr, ng, rb, su, cb, zero_bad, use_rescue, budgets, pixel, ch_over, \
            split_probe in tilings:
        try:
            if ch_over and ch_over != ch:
                ch = ch_over
                src = jnp.asarray(
                    rng.uniform(0, 2, (ih, iw, ch)).astype(np.float32))
            valid_px = None
            n_px_patched = None
            split_f, split_cap, n_split = None, 0, 0
            if split_probe:
                # s=1: the full product plan path with the pass-2b split
                # rescue (plan_with_rescue(split=True) — ladder-chosen
                # budgets; explicit rng:rg fields are ignored).
                plan8 = remap_fused.plan_with_rescue(
                    rot, use_rescue=use_rescue, split=True,
                    in_lens=in_lens, out_lens=out_lens, in_h=ih,
                    in_w=iw, out_h=oh, out_w=ow, interp=interp,
                    n_samples=1, tile_rows=tr, n_groups=ng, rb=rb,
                    scan_unroll=su, cb=cb, channels=ch,
                )
                (scalars, bad, rescue, cap, budgets, valid_px,
                 split_f, split_cap) = plan8
                n_resc = 0
                if rescue is not None:
                    n_resc = int(np.asarray(
                        jnp.sum(jnp.logical_and(bad, rescue[3] > 0))
                    ))
                if split_f is not None:
                    from image_lens_reproject_tpu.ops.pallas import (
                        remap_kernel as _RKP,
                    )
                    pm = jnp.logical_and(bad, jnp.logical_not(
                        _RKP._rescue_taken(bad, rescue, cap)))
                    n_split = int(np.asarray(jnp.sum(jnp.logical_and(
                        pm, jnp.all(split_f[3] > 0, axis=3)))))
            elif pixel:
                # The full product plan path: ladder-chosen budgets +
                # plan-time pixel compaction (explicit budgets ignored).
                (scalars, bad, rescue, cap, budgets, valid_px) = (
                    remap_fused.plan_with_rescue(
                        rot, use_rescue=use_rescue, pixel_patch=True,
                        in_lens=in_lens, out_lens=out_lens, in_h=ih,
                        in_w=iw, out_h=oh, out_w=ow, interp=interp,
                        n_samples=1, tile_rows=tr, n_groups=ng, rb=rb,
                        scan_unroll=su, cb=cb, channels=ch,
                    )
                )
                n_resc = 0
                if rescue is not None:
                    n_resc = int(np.asarray(
                        jnp.sum(jnp.logical_and(bad, rescue[3] > 0))
                    ))
                if valid_px is not None:
                    n_px_patched = int(np.asarray(
                        jnp.sum(valid_px[0] >= 0)))
            else:
                plan = remap_fused.make_plan(
                    rot, in_lens=in_lens, out_lens=out_lens, in_h=ih, in_w=iw,
                    out_h=oh, out_w=ow, interp=interp, n_samples=1, tile_rows=tr,
                    n_groups=ng, rb=rb, scan_unroll=su, cb=cb, channels=ch,
                    with_rescue=use_rescue, rescue_budgets=budgets,
                )
                scalars, bad = plan[:2]
                rescue = plan[2] if use_rescue else None
                cap = 0
                n_resc = 0
                if use_rescue:
                    n_resc = int(np.asarray(
                        jnp.sum(jnp.logical_and(bad, rescue[3] > 0))
                    ))
                    cap = max(128, -(-n_resc // 128) * 128) if n_resc else 0
            if zero_bad:
                # Kernel-only rate probe: pretend every tile fits (output
                # is WRONG in overflow regions — timing diagnostics only).
                bad = jnp.zeros_like(bad)
            frac_bad = float(jnp.mean(bad.astype(jnp.float32)))

            @jax.jit
            def chain(src_, seed, _s=scalars, _b=bad, _r=rescue, _tr=tr,
                      _ng=ng, _rb=rb, _su=su, _cb=cb, _cap=cap, _bud=budgets,
                      _vpx=valid_px, _sf=split_f, _scap=split_cap):
                return remap_fused.remap_tonemap_planned(
                    src_ + seed * jnp.float32(1e-12), rot, _s, _b, _r, _vpx,
                    _sf,
                    in_lens=in_lens, out_lens=out_lens, out_h=oh, out_w=ow,
                    interp=interp, n_samples=1, exposure=exposure,
                    reinhard=reinhard, tile_rows=_tr, n_groups=_ng, rb=_rb,
                    scan_unroll=_su, cb=_cb, rescue_cap=_cap,
                    rescue_budgets=_bud, split_cap=_scap,
                )

            out = chain(src, jnp.float32(0.0))
            np.asarray(out[0, :1, 0])
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
                rates.append(oh * ow * ITERS / dt / 1e6)
            steady = rates[1:] if len(rates) > 1 else rates
            print(json.dumps({
                "cfg": cfg, "tile_rows": tr, "n_groups": ng, "rb": rb,
                "scan_unroll": su, "cb": cb, "channels": ch,
                "mpix_s": round(float(np.median(steady)), 1),
                "reps": [round(r, 1) for r in rates],
                "frac_bad_subtiles": round(frac_bad, 4),
                "rescue_cap": cap,
                "rescued_subtiles": n_resc,
                "rescue_budgets": list(budgets) if budgets else None,
                "split_cap": split_cap,
                "split_subtiles": n_split,
                "pixel_patch": valid_px is not None,
                "patched_px": n_px_patched,
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "cfg": cfg, "tile_rows": tr, "n_groups": ng, "rb": rb,
                "scan_unroll": su, "cb": cb,
                "error": f"{type(e).__name__}: {e}"[:200],
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
