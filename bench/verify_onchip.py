"""On-chip pixel verification of the Pallas remap kernel vs the numpy oracle.

Interpreter-mode tests miss real-hardware miscompiles (e.g. the dynamic
negative-shift pltpu.roll bug); this harness runs a battery of configs on
the actual TPU and compares full outputs against the float32 oracle.
Run after any kernel change: python bench/verify_onchip.py
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def smooth(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(
        np.linspace(0, 1, h, dtype=np.float32),
        np.linspace(0, 1, w, dtype=np.float32),
        indexing="ij",
    )
    return np.stack(
        [0.5 + 0.45 * np.sin(4 * a * xx + 3 * b * yy + p)
         for a, b, p in rng.uniform(0.5, 2, (c, 3))],
        -1,
    ).astype(np.float32)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from image_lens_reproject_tpu.models.lens import (
        FisheyeEquidistant, FisheyeEquisolid, Rectilinear, full_equirectangular,
    )
    from image_lens_reproject_tpu.models.rotation import rotation_matrix_degrees
    from image_lens_reproject_tpu.ops import dispatch
    from image_lens_reproject_tpu.ops.pallas import remap_kernel as RK
    from image_lens_reproject_tpu.utils import oracle

    # Digest the kernel sources NOW, before any case runs: the marker
    # must attest the code this battery executed. If an edit lands while
    # the battery runs, write_onchip_marker(start_digest=...) refuses
    # the marker instead of attesting code that never ran (VERDICT r4:
    # the round-4 marker carried a post-edit digest).
    start_digest = dispatch.read_kernel_source_digest()

    RECT = Rectilinear(35.0, 36.0, 36.0)
    EQUIDIST = FisheyeEquidistant(math.pi, 36.0, 36.0)
    EQUISOLID = FisheyeEquisolid(15.0, math.pi, 36.0, 36.0)
    EQUIRECT = full_equirectangular()
    rot = rotation_matrix_degrees(15.0, 5.0, 0.0)
    rot180 = rotation_matrix_degrees(180.0, 0.0, 0.0)

    rot2 = rotation_matrix_degrees(30.0, 10.0, 5.0)
    cases = [
        ("equirect->rect bicubic rot 512", EQUIRECT, RECT, "bicubic", rot, (512, 512), (512, 512), 8, 0, 40),
        ("equirect->rect bicubic rot 512 T16", EQUIRECT, RECT, "bicubic", rot, (512, 512), (512, 512), 16, 0, 40),
        ("equirect->rect bicubic rot 512 T32", EQUIRECT, RECT, "bicubic", rot, (512, 512), (512, 512), 32, 0, 40),
        ("equirect->rect seam180 bl", EQUIRECT, RECT, "bilinear", rot180, (256, 512), (256, 256), 8, 0, 40),
        ("equidist->rect nn", EQUIDIST, RECT, "nearest", None, (256, 256), (256, 256), 8, 0, 40),
        ("equisolid->equirect bl T16", EQUISOLID, EQUIRECT, "bilinear", None, (256, 256), (128, 256), 16, 0, 40),
        ("rect->equisolid bc", RECT, EQUISOLID, "bicubic", None, (256, 256), (256, 256), 8, 0, 40),
        # tall-window variants (rb>40): polar-arc tiles + vectorized patch
        ("equisolid->equirect rot tall", EQUISOLID, EQUIRECT, "bilinear", rot2, (512, 512), (512, 1024), 8, 20, 160),
        ("rect->equisolid tall (annulus)", Rectilinear(50.0, 36.0, 36.0), EQUISOLID, "bilinear", None, (512, 512), (512, 512), 8, 20, 160),
        # per-sub-tile shift tilings: single-group and arc-slope groups
        ("equirect->rect bicubic T32 ng1", EQUIRECT, RECT, "bicubic", rot, (512, 512), (512, 512), 32, 1, 40),
        ("equirect->rect bicubic T32 ng2", EQUIRECT, RECT, "bicubic", rot, (512, 1024), (512, 512), 32, 2, 40),
        ("equisolid->equirect rot T32 ng5 rb80", EQUISOLID, EQUIRECT, "bilinear", rot2, (512, 512), (512, 1024), 32, 5, 80),
        ("equirect->rect ss2 T32 ng2", EQUIRECT, RECT, "bilinear", rot, (256, 512), (256, 256), 32, 2, 40),
        # whole-window kernel (scan_unroll<0): per-lane dynamic gathers
        ("equirect->rect bicubic WW T32 ng1", EQUIRECT, RECT, "bicubic", rot, (512, 512), (512, 512), 32, 1, 40),
        ("equirect->rect seam180 bl WW", EQUIRECT, RECT, "bilinear", rot180, (256, 512), (256, 256), 8, 0, 40),
        ("equisolid->equirect bl WW g2", EQUISOLID, EQUIRECT, "bilinear", None, (256, 256), (128, 256), 16, 0, 40),
        ("equirect->rect nn WW", EQUIRECT, RECT, "nearest", rot, (256, 512), (256, 256), 8, 0, 40),
        # ww2 two-step-gather body (scan_unroll<=-17): the planner's
        # headline/cfg1 pick — lane+sublane gather composition with the
        # per-pixel drift select must be exact on hardware
        ("equirect->rect bicubic WW2 T64", EQUIRECT, RECT, "bicubic", rot, (256, 512), (512, 512), 64, 1, 16),
        ("equirect->rect bl WW2 g2 4ch", EQUIRECT, RECT, "bilinear", None, (256, 512), (256, 512), 32, 1, 40),
        ("equirect->rect seam180 bl WW2", EQUIRECT, RECT, "bilinear", rot180, (128, 256), (256, 256), 16, 1, 16),
        ("equirect->rect ss2 WW2 bc", EQUIRECT, RECT, "bicubic", rot, (256, 512), (256, 256), 32, 1, 16),
        # rescue pass: bad sub-tiles recomputed by the compact
        # whole-window launch (per-slot own windows) before XLA patching
        ("rect->equisolid RESCUE", Rectilinear(50.0, 36.0, 36.0), EQUISOLID, "bilinear", None, (512, 512), (512, 512), 24, 1, 16),
        ("equisolid->equirect rot RESCUE", EQUISOLID, EQUIRECT, "bilinear", rot2, (512, 512), (512, 1024), 24, 2, 40),
        ("equirect->rect seam RESCUE bc", EQUIRECT, RECT, "bicubic", rot180, (256, 512), (256, 256), 16, 1, 16),
        ("rect->equisolid RESCUE ss2", Rectilinear(50.0, 36.0, 36.0), EQUISOLID, "bilinear", None, (512, 512), (512, 512), 24, 1, 16),
        # non-default rescue budgets (plan-chosen ladder entries): each
        # remap_kernel._RESCUE_VMEM_OK anchor must be exact on hardware
        # before choose_rescue_budgets may pick budgets under it.
        # ((12,8)/(16,8) with bilinear+ and bicubic beyond C=3 are
        # measured Mosaic scoped-VMEM compile FAILs — rescue_vmem_probe
        # — so the ladder never picks them; no cases here.)
        ("equisolid->equirect RESCUE ng12", EQUISOLID, EQUIRECT, "bilinear", rot2, (512, 512), (512, 1024), 24, 2, 40),
        ("rect->equisolid RESCUE ng12g6 4ch", Rectilinear(50.0, 36.0, 36.0), EQUISOLID, "bilinear", None, (512, 512), (512, 512), 24, 1, 16),
        ("rect->equisolid RESCUE 5ch", Rectilinear(50.0, 36.0, 36.0), EQUISOLID, "bilinear", None, (512, 512), (512, 512), 24, 1, 16),
        ("rect->equisolid RESCUE ng16g8 nn", Rectilinear(50.0, 36.0, 36.0), EQUISOLID, "nearest", None, (512, 512), (512, 512), 24, 1, 16),
        # tr=128 tall tiles (16 unrolled sub-tiles, SC=40 scalar layout):
        # compile feasibility AND exactness must be proven on hardware
        # before suggest_tiling admits _T128_CANDIDATES
        # (dispatch.t128_verified). Cases cover the scan body, the ww2
        # body (the planner's actual tr=128 shape), a 4-channel ww2, and
        # the non-divisible out_h padding path.
        ("equirect->rect bicubic T128 scan", EQUIRECT, RECT, "bicubic", rot, (512, 512), (512, 512), 128, 1, 32),
        ("equirect->rect bicubic WW2 T128", EQUIRECT, RECT, "bicubic", rot, (512, 512), (512, 512), 128, 1, 32),
        ("equirect->rect bl WW2 T128 4ch", EQUIRECT, RECT, "bilinear", None, (256, 512), (256, 512), 128, 1, 24),
        ("equirect->rect bc WW2 T128 pad200", EQUIRECT, RECT, "bicubic", rot, (256, 512), (200, 256), 128, 1, 24),
        # PIXEL-granular patch (pixel_patch=True): vpx claims specific
        # pixels of BAD sub-tiles are kernel-exact — only the hardware
        # run can attest that claim (dispatch.vpx_verified gates the
        # pipeline's pixel_patch plans). Cases: a mixed ring, the
        # fully-bad scan-clamp tiles (ADVICE r4 regression shape), and
        # the rescue+vpx composite the cfg2 pipeline plan will run.
        ("equirect->equidist VPX tr8", EQUIRECT, EQUIDIST, "bilinear", rot2, (256, 512), (320, 320), 8, 2, 40),
        ("equisolid->equirect VPX tr24 clamp", EQUISOLID, EQUIRECT, "bilinear", rot2, (512, 512), (512, 1024), 24, 2, 40),
        ("equisolid->equirect VPX+RESCUE", EQUISOLID, EQUIRECT, "bilinear", rot2, (512, 512), (512, 1024), 24, 2, 40),
        # pass-2b SPLIT rescue (split_cap > 0): per-piece window DMAs
        # into 4-D scratch, per-half lane/vertical rolls, lane-half-
        # selected index bases — new Mosaic surface interpret mode
        # cannot vouch for (dispatch.split_verified gates the planner).
        # Feasible region only (remap_kernel.split_feasible): the r5f
        # battery measured (8,6) BICUBIC C3 as a Mosaic compile FAIL
        # (whole-rescue twin is an OK anchor — the split body's extra
        # rolls/selects tip the scoped-VMEM stack) and C>=4 is unprobed;
        # both are statically rejected, so the cases here are the
        # bilinear C3 region the planner can actually emit.
        ("equisolid->equirect SPLIT bl", EQUISOLID, EQUIRECT, "bilinear", rot2, (768, 768), (768, 1536), 24, 3, 40),
        ("equisolid->equirect SPLIT bl 1024", EQUISOLID, EQUIRECT, "bilinear", rot2, (1024, 1024), (1024, 2048), 24, 3, 40),
    ]
    # (name, ..., n_samples): supersampling shares blocks + a margin+1
    # prepass across the stratified offsets — verify that path on-chip too.
    ns_for = {"equirect->rect bicubic rot 512 T16": 3,
              "rect->equisolid RESCUE ss2": 2,
              "equirect->rect ss2 WW2 bc": 2}
    # scan_unroll override: negative = whole-window gather chunks.
    su_for = {
        "equirect->equidist VPX tr8": 8,
        "equisolid->equirect VPX tr24 clamp": 8,
        "equisolid->equirect VPX+RESCUE": 8,
        "equisolid->equirect SPLIT bl": 32,
        "equisolid->equirect SPLIT bl 1024": 32,
        "equirect->rect bicubic WW T32 ng1": -1,
        "equirect->rect seam180 bl WW": -1,
        "equisolid->equirect bl WW g2": -2,
        "equirect->rect nn WW": -1,
        "equirect->rect bicubic WW2 T64": -17,
        "equirect->rect bl WW2 g2 4ch": -18,
        "equirect->rect seam180 bl WW2": -17,
        "equirect->rect ss2 WW2 bc": -17,
        "equirect->rect bicubic WW2 T128": -17,
        "equirect->rect bl WW2 T128 4ch": -18,
        "equirect->rect bc WW2 T128 pad200": -17,
    }
    # rescue_cap override: > 0 enables the pass-2 compact rescue launch.
    cap_for = {
        "equisolid->equirect SPLIT bl": 128,
        "equisolid->equirect SPLIT bl 1024": 256,
        "equisolid->equirect VPX+RESCUE": 512,
        "rect->equisolid RESCUE": 512,
        "equisolid->equirect rot RESCUE": 512,
        "equirect->rect seam RESCUE bc": 128,
        "rect->equisolid RESCUE ss2": 512,
        "equisolid->equirect RESCUE ng12": 512,
        "rect->equisolid RESCUE ng12g6 4ch": 512,
        "rect->equisolid RESCUE 5ch": 512,
        "rect->equisolid RESCUE ng16g8 nn": 512,
    }
    # rescue budget override: non-default (ng, g) ladder entries.
    budget_for = {
        "equisolid->equirect RESCUE ng12": (12, 6),
        "rect->equisolid RESCUE ng12g6 4ch": (12, 6),
        "rect->equisolid RESCUE ng16g8 nn": (16, 8),
    }
    # channel-count overrides (4/5ch exercise the interleave-heavy
    # budgets at the measured feasibility anchors).
    ch_for = {"rect->equisolid RESCUE ng12g6 4ch": 4,
              "rect->equisolid RESCUE 5ch": 5,
              "equirect->rect bl WW2 g2 4ch": 4,
              "equirect->rect bl WW2 T128 4ch": 4}
    # pixel-granular patch cases (scan_unroll defaults to 8 there so the
    # scan body + per-pixel exactness model are what run).
    vpx_names = {"equirect->equidist VPX tr8",
                 "equisolid->equirect VPX tr24 clamp",
                 "equisolid->equirect VPX+RESCUE"}
    # pass-2b split-rescue cases: split_cap > 0 (budgets default (8, 6)).
    split_cap_for = {"equisolid->equirect SPLIT bl": 256,
                     "equisolid->equirect SPLIT bl 1024": 256}

    import zlib

    failures = 0
    ww2_failures = 0
    t128_failures = 0
    vpx_failures = 0
    split_failures = 0

    def bucket(is_ww2, is_t128, is_vpx=False, is_split=False):
        # most-specific feature owns the failure: a tr=128 failure must
        # not withhold the ww2/rescue attestations (and vice versa)
        nonlocal failures, ww2_failures, t128_failures, vpx_failures, \
            split_failures
        if is_split:
            split_failures += 1
        elif is_vpx:
            vpx_failures += 1
        elif is_t128:
            t128_failures += 1
        elif is_ww2:
            ww2_failures += 1
        else:
            failures += 1

    for name, il, ol, interp, r, (ih, iw), (oh, ow), trows, ng, rb in cases:
        ns = ns_for.get(name, 1)
        su = su_for.get(name, 0)
        is_ww2 = su <= -17  # remap_kernel._WW2_BASE encoding
        is_t128 = trows >= 128
        is_vpx = name in vpx_names
        is_split = name in split_cap_for
        # crc32, not hash(): PYTHONHASHSEED randomizes hash() per process,
        # which would verify different pixel data every battery run and
        # make a marginal failure unreproducible.
        src = smooth(ih, iw, ch_for.get(name, 3),
                     seed=zlib.crc32(name.encode()) % 1000)
        rj = None if r is None else jnp.asarray(r)
        try:
            out = RK.remap_pallas(
                jnp.asarray(src), rj, in_lens=il, out_lens=ol,
                out_h=oh, out_w=ow, interp=interp, n_samples=ns,
                tile_rows=trows, n_groups=ng, rb=rb, scan_unroll=su,
                rescue_cap=cap_for.get(name, 0),
                rescue_budgets=budget_for.get(name),
                pixel_patch=is_vpx,
                split_cap=split_cap_for.get(name, 0),
            )
            got = np.asarray(out)
        except Exception as e:  # compile crash must not kill the battery
            print(f"{name:40s} EXCEPTION {type(e).__name__}: "
                  f"{str(e)[:160]} FAIL", flush=True)
            bucket(is_ww2, is_t128, is_vpx, is_split)
            continue
        want = oracle.oracle_remap(
            src, r, in_lens=il, out_lens=ol,
            out_h=oh, out_w=ow, interp=interp, n_samples=ns,
        )
        err = np.abs(got - want)
        p999 = float(np.quantile(err, 0.999))
        frac_bad = float((err.max(axis=-1) > 1e-3).mean())
        ok = p999 < 1e-3 and frac_bad < 1e-3
        print(f"{name:40s} p999={p999:.2e} frac>1e-3={frac_bad:.2e} "
              f"max={err.max():.2e} {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            bucket(is_ww2, is_t128, is_vpx, is_split)
    # An honest verdict: PASS only when EVERY bucket is clean (a clean
    # base with ww2/t128/vpx failures previously printed "PASS" and was
    # easy to misread in recovery logs — ADVICE r4).
    any_fail = (failures + ww2_failures + t128_failures + vpx_failures
                + split_failures)
    verdict = "PASS" if any_fail == 0 else (
        "PARTIAL" if failures == 0 else f"FAIL ({failures})")
    print(f"RESULT: {verdict} (base failures: {failures}, "
          f"ww2: {ww2_failures}, t128: {t128_failures}, "
          f"vpx: {vpx_failures}, split: {split_failures})")
    # Record the hardware-exactness evidence: a zero-failure run on a
    # real TPU writes .onchip_verified.json (keyed by a digest of the
    # kernel sources), which is what lets the pipeline/bench enable the
    # pass-2 rescue (ops/dispatch.rescue_enabled). ww2 failures are
    # tracked SEPARATELY: a broken ww2 path must not withhold the rescue
    # attestation (the planner simply keeps the scan body,
    # dispatch.ww2_verified), and vice versa.
    platform = jax.devices()[0].platform
    if platform == "tpu":  # CPU runs are not hardware evidence
        dispatch.write_onchip_marker(platform, f"{len(cases)} configs",
                                     failures, ww2_failures=ww2_failures,
                                     t128_failures=t128_failures,
                                     vpx_failures=vpx_failures,
                                     split_failures=split_failures,
                                     start_digest=start_digest)
        if failures == 0:
            print("onchip marker written: rescue enabled for current "
                  "kernel sources"
                  + ("" if ww2_failures else "; ww2 attested")
                  + ("" if t128_failures else "; t128 attested")
                  + ("" if vpx_failures else "; vpx attested")
                  + ("" if split_failures else "; split attested"))
    return 0 if any_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
