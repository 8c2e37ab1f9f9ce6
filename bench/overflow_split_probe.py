"""Bound the finer-granularity-rescue lever on cfg2/cfg4 (CPU, config-only).

The polar-arc BASELINE configs pay their bill in the overflow cascade:
patched sub-tiles cost ~28.7 ns/px (XLA gather) and the pass-2 rescue
admits only sub-tiles whose OWN (8 x 128) window fits the (ng, g)
budgets (span <= ng*8 rows, ext*C <= g*128 cols,
ops/pallas/remap_kernel.py _prepass rescue admission). Two candidate
levers could shrink the patched set without new hardware tricks:

  1. COLUMN-SPLIT rescue: admit at 8 x 64 / 8 x 32 granularity — a
     steep mapping's window extent shrinks roughly with the output
     column span, so halves/quarters of an unrescuable sub-tile may fit
     the same budgets.
  2. TWO-SEGMENT windows: the fold ring samples two disjoint source
     clusters (the /(−z) mirror); two half-budget windows could cover
     what one contiguous window cannot.

This probe computes, per currently-PATCHED sub-tile (bad and not
rescue-admitted at the plan-chosen budgets), the per-piece window
extents from the same kxp tap fields the prepass uses, and reports what
fraction of patched PIXELS each scheme would recover at each feasible
ladder entry. Admission here checks the two binding constraints only
(row span, lane budget) — base-clip/seam edge cases shave a few percent
in the real prepass — so the numbers are upper bounds on the lever.

Run on the CPU backend (config-only; no chip needed):
    PYTHONPATH=/root/repo:$PYTHONPATH python bench/overflow_split_probe.py
"""

import math

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from image_lens_reproject_tpu.models.lens import (
    FisheyeEquisolid, Rectilinear, full_equirectangular,
)
from image_lens_reproject_tpu.models.rotation import rotation_matrix_degrees
from image_lens_reproject_tpu.ops.pallas import remap_kernel as RK
from image_lens_reproject_tpu.ops.pallas import taps as taps_mod
from image_lens_reproject_tpu.ops import remap as remap_ops


def pixel_tap_fields(in_lens, out_lens, in_h, in_w, out_h, out_w,
                     rotation, interp, tile_rows):
    """Per-pixel monotonized x-tap / y-tap extremes in padded coords,
    mirroring _prepass (remap_kernel.py:1025-1043) at n_samples=1."""
    wrap = RK.wrap_mode_for_input(in_lens)
    n_ty = -(-out_h // tile_rows)
    n_tx = -(-out_w // RK.TC)
    xt, yt = RK._field_taps(
        in_lens, out_lens, in_h, in_w, out_h, out_w,
        rotation, 0.0, 0.0, interp, wrap, n_ty, n_tx, tile_rows)
    xs = jnp.stack(list(xt.idx))
    cmin_u = RK._tile_reduce(jnp.min(xs, axis=0), n_ty, n_tx, "min", tile_rows)
    cmax_u = RK._tile_reduce(jnp.max(xs, axis=0), n_ty, n_tx, "max", tile_rows)
    seam = jnp.logical_and(wrap, (cmax_u - cmin_u) > (in_w // 2))
    seam_px = jnp.repeat(jnp.repeat(seam, tile_rows, axis=0), RK.TC, axis=1)
    xs_m = jnp.stack([
        taps_mod.monotonize_x(i, in_w, seam_px, xp=jnp) for i in xt.idx
    ]) + RK.PAD
    ys = jnp.stack(list(yt.idx)) + RK.PAD
    kmin = np.asarray(jnp.min(xs_m, axis=0))
    kmax = np.asarray(jnp.max(xs_m, axis=0))
    ymin = np.asarray(jnp.min(ys, axis=0))
    ymax = np.asarray(jnp.max(ys, axis=0))
    return kmin, kmax, ymin, ymax, n_ty, n_tx


def piece_stats(kmin, kmax, ymin, ymax, patched, tile_rows, n_ty, n_tx,
                piece_cols, margin, channels, ladder):
    """Fraction of patched pixels whose (8 x piece_cols) piece fits each
    (ng, g) ladder entry's span/lane budgets."""
    n_sub = tile_rows // 8
    n_piece = RK.TC // piece_cols
    shape = (n_ty, n_sub, 8, n_tx, n_piece, piece_cols)
    rs = lambda f: f.reshape(shape)
    pk_min = rs(kmin).min(axis=(2, 5))   # (n_ty, n_sub, n_tx, n_piece)
    pk_max = rs(kmax).max(axis=(2, 5))
    py_min = rs(ymin).min(axis=(2, 5))
    py_max = rs(ymax).max(axis=(2, 5))
    span = py_max - py_min + 2 * margin + 1
    ext = pk_max - pk_min + 2 * margin + 1
    mask = patched[:, :, :, None]        # every piece of a patched sub-tile
    out = {}
    for ng, g in ladder:
        # Piece-packed slots: k pieces share the g*128 gather lanes, so
        # each piece gets g*128/k — and the block patch overwrites whole
        # 8x128 sub-tiles, so savings only accrue when ALL k pieces fit.
        k = RK.TC // piece_cols
        fit = (span <= ng * 8) & (ext * channels <= g * 128 // k)
        all_fit = fit.all(axis=3, keepdims=True) & mask
        out[(ng, g)] = float(all_fit.sum()) / max(float(patched.sum()), 1)
    # binding-constraint decomposition at the tallest entry
    ng, g = ladder[-1]
    k = RK.TC // piece_cols
    rows_ok = (span <= ng * 8) & mask
    cols_ok = (ext * channels <= g * 128 // k) & mask
    out["rows_only_fail"] = float((~rows_ok & cols_ok & mask).sum()) / max(
        float(mask.sum()), 1)
    out["cols_only_fail"] = float((rows_ok & ~cols_ok & mask).sum()) / max(
        float(mask.sum()), 1)
    return out


def two_cluster_stats(kmin, kmax, ymin, ymax, patched, tile_rows, n_ty,
                      n_tx, margin, channels, ladder):
    """Best-case two-segment cover: split each patched sub-tile's pixel
    x-intervals at the largest kmin gap; both clusters must fit HALF the
    lane budget each (two windows share the g vregs) and the row span
    the full ng*8 (one shared row window per segment pair)."""
    n_sub = tile_rows // 8
    ids = np.argwhere(patched)
    if not len(ids):
        return {k: 0.0 for k in [tuple(e) for e in ladder]}
    km = kmin.reshape(n_ty, n_sub, 8, n_tx, RK.TC)
    kM = kmax.reshape(n_ty, n_sub, 8, n_tx, RK.TC)
    ym = ymin.reshape(n_ty, n_sub, 8, n_tx, RK.TC)
    yM = ymax.reshape(n_ty, n_sub, 8, n_tx, RK.TC)
    fits = {tuple(e): 0 for e in ladder}
    for ty, s, tx in ids:
        lo = km[ty, s, :, tx, :].ravel()
        hi = kM[ty, s, :, tx, :].ravel()
        span = yM[ty, s, :, tx, :].max() - ym[ty, s, :, tx, :].min() \
            + 2 * margin + 1
        order = np.argsort(lo)
        lo_s, hi_s = lo[order], hi[order]
        gaps = lo_s[1:] - np.maximum.accumulate(hi_s[:-1])
        if len(gaps) == 0 or gaps.max() <= 0:
            ext1 = hi.max() - lo.min() + 2 * margin + 1
            ext2 = 0
        else:
            cut = int(np.argmax(gaps)) + 1
            ext1 = hi_s[:cut].max() - lo_s[0] + 2 * margin + 1
            ext2 = hi_s[cut:].max() - lo_s[cut:].min() + 2 * margin + 1
        for ng, g in ladder:
            half = g * 128 // 2
            if (span <= ng * 8 and ext1 * channels <= half
                    and ext2 * channels <= half):
                fits[(ng, g)] += 1
    n = len(ids)
    return {k: v / n for k, v in fits.items()}


def analyze(name, in_lens, out_lens, in_h, in_w, out_h, out_w, rotation,
            interp, channels, tile_rows, n_groups, rb, scan_unroll,
            budgets, ladder):
    print(f"\n=== {name} (tiling {tile_rows}:{n_groups}:{rb}:{scan_unroll}, "
          f"C={channels}, budgets {budgets}) ===")
    kw = dict(in_lens=in_lens, out_lens=out_lens, in_h=in_h, in_w=in_w,
              out_h=out_h, out_w=out_w, interp=interp, channels=channels,
              tile_rows=tile_rows, n_groups=n_groups, rb=rb,
              scan_unroll=scan_unroll)
    _, bad, rescue = RK.make_prepass(
        rotation, with_rescue=True, rescue_budgets=budgets, **kw)
    bad = np.asarray(bad)
    resc_ok = np.asarray(rescue[3] > 0)
    patched = bad & ~resc_ok
    n_bad, n_resc, n_patch = int(bad.sum()), int((bad & resc_ok).sum()), \
        int(patched.sum())
    total = bad.size
    print(f"sub-tiles: {total} total, {n_bad} bad ({n_bad/total:.1%}), "
          f"{n_resc} rescued, {n_patch} patched "
          f"({n_patch/total:.1%} of all, "
          f"{n_patch/max(n_bad,1):.1%} of bad)")
    margin = RK._margin_for(interp)
    kmin, kmax, ymin, ymax, n_ty, n_tx = pixel_tap_fields(
        in_lens, out_lens, in_h, in_w, out_h, out_w, rotation, interp,
        tile_rows)
    for piece in (128, 64, 32):
        st = piece_stats(kmin, kmax, ymin, ymax, patched, tile_rows,
                         n_ty, n_tx, piece, margin, channels, ladder)
        entries = "  ".join(
            f"({ng},{g})={st[(ng, g)]:.1%}" for ng, g in ladder)
        print(f"  8x{piece:<3} pieces fitting: {entries}   "
              f"[fail rows-only {st['rows_only_fail']:.1%}, "
              f"cols-only {st['cols_only_fail']:.1%} at {ladder[-1]}]")
    tc = two_cluster_stats(kmin, kmax, ymin, ymax, patched, tile_rows,
                           n_ty, n_tx, margin, channels, ladder)
    entries = "  ".join(f"({ng},{g})={tc[(ng, g)]:.1%}" for ng, g in ladder)
    print(f"  two-segment (half-lane each) sub-tiles fitting: {entries}")


def main():
    EQUISOLID = FisheyeEquisolid(15.0, math.pi, 36.0, 36.0)
    EQUIRECT = full_equirectangular()
    # feasible bilinear ladder entries (rescue_feasible): C3/C4 -> (8,6),(12,6)
    ladder = [(8, 6), (12, 6)]
    analyze("cfg2 equisolid->equirect rot bl",
            EQUISOLID, EQUIRECT, 2048, 2048, 2048, 4096,
            rotation_matrix_degrees(30.0, 10.0, 5.0), "bilinear", 3,
            24, 3, 40, 32, (8, 6), ladder)
    analyze("cfg4 rect->equisolid RGBZ bl",
            Rectilinear(50.0, 36.0, 36.0), EQUISOLID, 2048, 2048, 2048, 2048,
            None, "bilinear", 4,
            16, 1, 16, 32, (8, 6), ladder)


if __name__ == "__main__":
    main()
