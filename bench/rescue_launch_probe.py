"""Decompose the pass-2 rescue's per-launch fixed cost on the real chip.

The chooser models rescue as `n_adm * 1024 * (patch_ns - rescue_ns) -
_RESCUE_LAUNCH_NS` (remap_kernel.py); the fixed term was fitted at
2.8 ms in r4 and is ~30% of cfg2's rescue bill — and what vetoes cfg4's
rescue outright (VERDICT r4 #5). This probe separates fixed from
per-pixel directly: `_rescue_taken` caps the rescued set in row-major
cumsum order, so sweeping ``rescue_cap`` at a FIXED plan varies the
rescued sub-tile count without changing anything else; un-rescued
sub-tiles fall back to the XLA block patch, so

    t(cap) = t_base + launch_fixed + min(cap, n_adm)*1024*(resc - patch)

is linear in the rescued count for cap > 0, and the cap=0 point (rescue
disabled entirely) anchors t_base without launch_fixed. A least-squares
line over the cap>0 points gives the slope (rescue_ns - patch_ns per
rescued px) and its intercept minus t(0) gives launch_fixed.

Usage: python bench/rescue_launch_probe.py [cfg] [--smoke]
  cfg in {2, 4} (default 2)
  --smoke: CPU interpret mode, tiny shapes, 2 iters — flow self-check
           only, the numbers are meaningless (run before queuing a
           battery, per CLAUDE.md).
Prints one JSON line per cap plus a final "fit" line.
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
    global ITERS, REPS
    smoke = "--smoke" in sys.argv
    if smoke:
        sys.argv = [a for a in sys.argv if a != "--smoke"]
        ITERS, REPS = 2, 1
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    if smoke:
        from image_lens_reproject_tpu.ops.pallas import remap_kernel as _RK
        _RK.set_interpret(True)

    from image_lens_reproject_tpu.models.lens import (
        FisheyeEquisolid, Rectilinear, full_equirectangular,
    )
    from image_lens_reproject_tpu.models.rotation import (
        rotation_matrix_degrees,
    )
    from image_lens_reproject_tpu.ops import remap_fused

    cfg = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    if cfg == 2:
        in_lens = FisheyeEquisolid(15.0, math.pi, 36.0, 36.0)
        out_lens = full_equirectangular()
        ih, iw, oh, ow, interp, ch = 2048, 2048, 2048, 4096, "bilinear", 3
        rot = jnp.asarray(rotation_matrix_degrees(30.0, 10.0, 5.0))
        tr, ng, rb, su, cb = 24, 3, 40, 32, 256
        if smoke:
            ih, iw, oh, ow = 128, 128, 128, 256
            tr, ng, rb, su = 8, 2, 40, 8
    elif cfg == 4:
        in_lens = Rectilinear(50.0, 36.0, 36.0)
        out_lens = FisheyeEquisolid(15.0, math.pi, 36.0, 36.0)
        ih, iw, oh, ow, interp, ch = 2048, 2048, 2048, 2048, "bilinear", 4
        rot = None
        tr, ng, rb, su, cb = 16, 1, 16, 32, 256
    else:
        raise SystemExit(f"unsupported cfg {cfg}")

    kw = dict(in_lens=in_lens, out_lens=out_lens, in_h=ih, in_w=iw,
              out_h=oh, out_w=ow, interp=interp, n_samples=1,
              tile_rows=tr, n_groups=ng, rb=rb, scan_unroll=su, cb=cb,
              channels=ch)
    scalars, bad, rescue, full_cap, budgets, _ = remap_fused.plan_with_rescue(
        rot, use_rescue=True, pixel_patch=False, **kw)
    if rescue is None:
        # The chooser vetoed rescue (e.g. cfg4's fitted economics); plan
        # the budgets explicitly so the sweep can still measure the
        # launch cost it would pay.
        from image_lens_reproject_tpu.ops.pallas import remap_kernel as RK
        budgets = next(
            (b for b in RK.RESCUE_LADDER
             if RK.rescue_feasible(b[0], b[1], ch,
                                   RK._interp_taps(interp))),
            None)
        if budgets is None:
            raise SystemExit("no feasible rescue budgets for this cfg")
        plan = remap_fused.make_plan(
            rot, with_rescue=True, rescue_budgets=budgets, **kw)
        scalars, bad, rescue = plan
        n_adm = int(np.asarray(
            jnp.sum(jnp.logical_and(bad, rescue[3] > 0))))
        full_cap = -(-n_adm // 128) * 128 if n_adm else 0
    n_adm = int(np.asarray(jnp.sum(jnp.logical_and(bad, rescue[3] > 0))))
    if full_cap == 0:
        raise SystemExit("nothing rescuable at this tiling")

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(0, 2, (ih, iw, ch)).astype(np.float32))

    caps = sorted({0, 128, 256, 512, full_cap} | (
        {full_cap // 2} if full_cap > 512 else set()))
    caps = [c for c in caps if c <= full_cap]

    overhead = None
    points = []
    for cap in caps:
        r = rescue if cap > 0 else None
        b = budgets if cap > 0 else None

        @jax.jit
        def chain(src_, seed, _cap=cap, _r=r, _b=b):
            return remap_fused.remap_tonemap_planned(
                src_ + seed * jnp.float32(1e-12), rot, scalars, bad, _r,
                None,
                in_lens=in_lens, out_lens=out_lens, out_h=oh, out_w=ow,
                interp=interp, n_samples=1, exposure=1.0, reinhard=1.0,
                tile_rows=tr, n_groups=ng, rb=rb, scan_unroll=su, cb=cb,
                rescue_cap=_cap, rescue_budgets=_b,
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
        times = []
        for _ in range(REPS):
            seed = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = chain(src, seed)
                seed = out[0, 0, 0]
            np.asarray(out[0, :1, 0])
            times.append((time.perf_counter() - t0 - overhead) / ITERS)
        t_frame = float(np.median(times[1:] if len(times) > 1 else times))
        n_resc = min(cap, n_adm)
        points.append((n_resc, t_frame, cap))
        print(json.dumps({
            "cfg": cfg, "cap": cap, "rescued_subtiles": n_resc,
            "budgets": list(budgets), "frame_s": round(t_frame, 6),
            "mpix_s": round(oh * ow / t_frame / 1e6, 1),
        }), flush=True)

    live = [(n, t) for n, t, c in points if c > 0]
    base = next((t for n, t, c in points if c == 0), None)
    fit = {}
    if len(live) >= 2 and base is not None:
        xs = np.array([n * 1024 for n, _ in live], dtype=np.float64)
        ts = np.array([t for _, t in live], dtype=np.float64)
        slope, intercept = np.polyfit(xs, ts, 1)
        fit = {
            "launch_fixed_ms": round((intercept - base) * 1e3, 3),
            "rescue_minus_patch_ns_per_px": round(slope * 1e9, 2),
            "base_frame_s_cap0": round(base, 6),
            "r4_fitted_launch_ms": 2.8,
        }
    print(json.dumps({"cfg": cfg, "fit": fit, "n_admitted": n_adm,
                      "full_cap": full_cap}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
