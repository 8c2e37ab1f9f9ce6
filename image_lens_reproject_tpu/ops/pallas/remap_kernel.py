"""Fused Pallas TPU remap kernel — the framework's performance path.

Why a custom kernel: XLA lowers the remap's per-tap gathers to a scalar
dynamic-slice loop on TPU (measured ~3.4 Mpix/s for the 4K bicubic
headline — slower than CPU). TPU hardware has no arbitrary per-lane
gather; the one per-element dynamic primitive Mosaic exposes on this
target is the *sublane* gather (``take_along_axis(op, idx, axis=0)`` with
an (8, L) operand). This kernel is built around it:

  * The output is tiled (tile_rows x 128). An XLA prepass computes every
    tile's source-texel window (exact tap extremes, per 8-row SUB-TILE).
    In-kernel double-buffered DMA fetches each scan step's (2*rb, SU*C)
    window straight from the HBM-resident interleaved (H, W*C) padded
    source at dynamic offsets (row base 8-quantized, lane base rounded
    down to 128 and re-aligned by a dynamic lane roll). DMAs are issued
    one step ahead and across tile boundaries, hiding the ~us fetch
    latency behind compute.
  * Per tile the kernel scans the window's source columns in
    SCAN_UNROLL-column steps (sized ~= the p99 tile window so most tiles
    scan once). Per step: the step's columns are transposed as one batch
    to put rows on sublanes and rolled once PER 8-ROW SUB-TILE so each
    sub-tile's window start lands on sublane 0 — bounding the gather
    count by the *sub-tile* row span (n_groups, usually 1) instead of
    the whole tile's. One sublane gather per (row-tap, group, sub-tile)
    picks each output pixel's row; masked FMAs apply the exact
    interpolation weights (truncation/wrap/clamp semantics shared with
    ops/sampling.py via ops/pallas/taps.py). ``scan_unroll < 0`` selects
    the whole-window mode instead (see below).
  * Sub-tiles whose windows overflow the shared budgets are handled by a
    cascade: a compact pass-2 "rescue" launch recomputes sub-tiles whose
    OWN window fits fixed budgets (one grid slot per bad sub-tile), the
    rest are patched by chunked vectorized XLA sampling, and a frame
    whose bad fraction exceeds 60% flips wholesale to the pure-XLA path
    via lax.cond — outputs are always exact w.r.t. the reference
    formulas.

Supersampling runs one kernel launch per stratified offset and averages
outside, matching the reference's accumulation (src/reproject.cpp:294-341).
"""

from __future__ import annotations

import functools
import sys
import warnings
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.lens import LensSpec, wrap_mode_for_input
from .. import remap as remap_ops
from . import taps as taps_mod
from . import ww2 as ww2_mod
from .kernel_math import kxp

Array = Any

# --- tiling constants ---
TR = 8      # default output tile rows (see tile_rows parameter; 16 shares
            # each scan column's read/transpose/roll across two 8-row
            # sub-tiles — the dominant per-column cost — when row spans fit)
TC = 128    # output tile cols (one vreg of lanes)
RB = 40     # default source row-window quantization step; blocks span 2*rb
            # rows. Per-launch ``rb`` overrides admit tall windows (fisheye
            # <-> equirect polar arcs need 100-200-row spans); the group
            # budget scales with it (see _max_groups).
CB = 256    # source col-window quantization step; a tile window spans 2*CB cols
PAD = 4     # source padding (covers bicubic taps at clamped borders)
MARGIN = 1  # window slack for prepass-vs-kernel transcendental ulp drift (+-1 tap)
SCAN_UNROLL = 32  # source columns per scan step (~=p99 tile window: most tiles scan once)
SC = 40     # per-tile scalar slots (6 fixed + 2 per 8-row sub-tile: tile_rows<=128;
            # 4K grid at SC=40 is ~82 KB of SMEM scalars, well under the 1 MB cap)

# WHOLE-WINDOW kernel mode: ``scan_unroll = -g`` (g gather chunks) fetches
# each tile's ENTIRE column window into g 128-lane vregs and distributes
# source texels to output pixels by per-lane dynamic gathers
# (take_along_axis on the lane dim — exact on hardware for (S, 128)
# operands), instead of scanning columns one at a time. Work per sub-tile
# drops from O(n_scan * C * taps) broadcast/select chains to
# O(ng*8 * C * taps) gathers — ~4x fewer vector ops for single-chunk
# smooth tiles (the headline config). Admission: the tile's column window
# must fit g*128 lanes (g*128//C columns) with a SINGLE roll shift per
# sub-tile (no per-step drift — the prepass's single-chunk fit gives
# drift = 0 automatically).


# scan_unroll <= -(_WW2_BASE + 1) selects the drift-corrected two-step
# gather whole-window body (ops/pallas/ww2.py) with -su - _WW2_BASE
# chunks; plain negatives select the row-loop whole-window body. The
# flag rides in scan_unroll so every existing plan/cache/CLI path keys
# the mode without signature changes.
_WW2_BASE = 16


def _resolve_su(scan_unroll: int, c_ch: int):
    """Return (scan cols per step, gather chunks, ww2) for a scan_unroll knob.

    Positive values select the scan kernel with that unroll; negative
    values select a whole-window kernel with ``-scan_unroll`` 128-lane
    gather chunks (the scan budget is then the chunk capacity in
    columns); below ``-_WW2_BASE`` the two-step-gather body replaces the
    row loop (chunks = ``-scan_unroll - _WW2_BASE``).
    """
    if scan_unroll < 0:
        g = -scan_unroll
        ww2 = g > _WW2_BASE
        if ww2:
            g -= _WW2_BASE
        return (g * 128) // c_ch, g, ww2
    return (scan_unroll if scan_unroll > 0 else SCAN_UNROLL), 0, False

# RESCUE PASS (pass 2) statics: sub-tiles the main kernel's shared
# windows reject are re-run through a COMPACT whole-window launch with
# per-sub-tile OWN windows (one (2*rb2, (g+1)*128) DMA per slot, ng*8
# gather rows) before falling back to the ~30 ns/px XLA patch.
# Admission is per sub-tile: row span <= ng*8 and column extent *
# channels <= g*128. The (ng, g) budgets are PER-PLAN parameters
# (``rescue_budgets``) — taller/wider budgets admit more sub-tiles at a
# per-slot cost that scales with ng*(2g-1); remap_fused.
# choose_rescue_budgets picks the savings-maximizing ladder entry from
# the config's actual span/extent distribution. These module values are
# the defaults.
RESCUE_NG = 8
RESCUE_G = 6
# Ladder of admissible (ng, g) budgets for the auto-chooser. Bounded by
# scoped VMEM (scratch = 2 * 2*rb2 * (g+1)*128 f32; (16, 8) is 1.33 MB)
# and by the per-slot gather cost approaching the XLA patch beyond it.
RESCUE_LADDER = ((8, 6), (12, 6), (12, 8), (16, 8))

# Scoped-VMEM compile feasibility of the compact rescue launch, measured
# on a real v5e (bench/rescue_vmem_probe.py, 2026-08-19). Mosaic unrolls
# ng*8 gather rows x channels*taps gathers with (g-1) chained selects
# per sub-tile, and its scoped-VMEM *stack* (not the scratch buffers)
# hard-fails past the 16 MiB limit — e.g. (12, 8, C=3, bilinear) needs
# 16.98M, (8, 6, C=4, bicubic) 22.46M, (12, 6, C=4, bicubic) 33.62M.
# Feasibility is antitone in each of (ng, g, channels, taps), so a combo
# is feasible iff it is componentwise <= a measured-OK anchor; anything
# else (including unprobed in-between combos) is conservatively rejected
# — extend the probe grid before admitting new corners.
_RESCUE_VMEM_OK = (
    # (ng, g, channels, taps) — measured compile-OK on chip. Nearby
    # measured FAILs bound each anchor: (8,6,4,bc) 22.46M, (12,6,3,bc)
    # 21.62M, (12,6,5,bl), (12,8,3,bl) 16.98M, (16,8,3,bl), (16,8,4,nn).
    (8, 6, 3, 4),    # default budgets, bicubic C=3
    (8, 6, 5, 2),    # default budgets, bilinear up to RGBAZ
    (12, 6, 4, 2),   # plan pick for BASELINE cfgs 2 (C=3) and 4 (C=4)
    (16, 8, 3, 1),   # nearest is light enough for the top ladder entry
)


def rescue_feasible(ng: int, g: int, channels: int, taps: int) -> bool:
    """Can the compact rescue launch COMPILE at these budgets?

    Consulted by the planner (plan_with_rescue / suggest_tiling's
    rescue-ladder sim) so it never picks budgets that crash Mosaic.
    Ranking-only callers must not bypass it: an infeasible pick is a
    hard compile failure on hardware, not a slow one.
    """
    key = (ng, g, channels, taps)
    return any(
        all(k <= a for k, a in zip(key, ok)) for ok in _RESCUE_VMEM_OK
    )


def _rescue_rb(ng: int) -> int:
    """Row-block half-height for an ng-group rescue window: the ng*8
    gather rows plus 8-quantization headroom for the window base
    (shift2 <= 7 + margin) must fit the 2*rb2 DMA block."""
    return ng * 4 + 8


def rescue_cost_ns_per_px(ng: int, g: int, channels: int, taps: int) -> float:
    """Modeled pass-2 cost per rescued pixel (ns) for (ng, g) budgets.

    The compact whole-window launch runs ng*8 gather rows per 8x128
    sub-tile; each row costs the mask chain (~taps*3), g chunk
    broadcasts, and channels*taps gathers with (g-1) chained selects.
    The 2.66 ns/vector-op scale is FITTED to the round-4 on-chip fit
    triples (`git 878b492` bench/recovery_out/fit.log): after removing
    the per-launch fixed cost _RESCUE_LAUNCH_NS, cfg2 (12,6,C3,bl)
    measures 22.2 ns/px (model 8.34 ops-units) and cfg4 (12,6,C4,bl)
    27.7 (model 10.41) — one scale fits both to <1%. Total measured
    cost incl. the launch share was 23.74 / 34.08 ns/px. Ranking-only:
    exactness is prepass-guarded.
    """
    ops_per_row = channels * taps * (2 * g - 1) + taps * 3 + g + 11
    return ng * 8 * ops_per_row / 1024.0 * 2.66


# Fixed per-launch cost of the pass-2 rescue (prepass slot compaction,
# scatter landing, launch overhead). r4 fitted 2.8 ms jointly with the
# 2.66 op scale (`git 878b492`); after the sorted/unique scatter landing
# (`git de27230`) the r5 cap-sweep probe (bench/rescue_launch_probe.py,
# bench/recovery_out/rescueprof2_r5b.log) isolated the fixed term
# directly: launch_fixed = 1.264 ms on cfg2 (30-iter chained reps; the
# cfg4 sweep's -1.6 ms intercept is rep noise on a 2.7 ms-total bill and
# is discarded). Both budget choosers subtract this from the modeled
# saving, so rescues that cannot clear the launch stay rejected — at
# 1.26 ms cfg4's full-frame (8,6) rescue now clears (measured win:
# 83.8 -> 84.4-88.7 Mpix/s, rescueprof4_r5b.log) while small frames
# (< ~120 admitted sub-tiles at bilinear margins) stay vetoed.
_RESCUE_LAUNCH_NS = 1.26e6


RESCUE_RB = _rescue_rb(RESCUE_NG)  # default-budget block half-height (40)

# Default row-group count per 8-row SUB-TILE (each sub-tile has its own
# roll shift, so ``n_groups`` bounds the *sub-tile* row span — covering
# spans up to groups*8 - 2*MARGIN - taps source rows). suggest_tiling
# picks more groups and/or a taller rb when spans demand it.
_GROUPS_FOR_TILE_ROWS = {8: 2, 16: 2, 24: 2, 32: 2, 48: 2, 64: 2, 128: 2}


def _max_groups(rb: int) -> int:
    # Groups may promise up to the full 2*rb block; tiles whose quantization
    # shift eats into that are caught by the prepass block-fit check and
    # fall back, so correctness never depends on this cap.
    return (2 * rb) // 8


def _active_groups(tile_rows: int) -> int:
    return _GROUPS_FOR_TILE_ROWS[tile_rows]

# Interpreter mode for CPU-backend tests (set by tests/conftest fixtures).
_INTERPRET = False

# Configs whose cost-model failure has already been warned about (the
# fallback is per-call; the warning should not spam a frame stream).
_tiling_fallback_warned: set = set()


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(value)


def _interp_taps(interp: str) -> int:
    return {"nearest": 1, "bilinear": 2, "bicubic": 4}[interp]


def _margin_for(interp: str) -> int:
    """Per-side window slack for prepass-vs-kernel coordinate drift.

    The prepass computes tap windows with the same kxp math the kernel
    uses, so drift is at most a few ulps of the source coordinate
    (~1e-4 texel after gradient scaling) from compiler-level FMA
    contraction differences. A drift-flipped trunc boundary moves a tap by
    one texel, but for bilinear/bicubic the entering/leaving tap's weight
    is O(drift) there — no whole-texel slack needed. Nearest's single tap
    carries weight 1 across the flip, so keep one texel of slack.
    """
    return 1 if interp == "nearest" else 0


def _prepass_offsets(n_samples: int):
    """Offsets whose tap-window union covers every stratified offset.

    For n=1 the single (0,0) pass. For supersampled runs, the four corner
    combinations of the extreme stratified offsets bound the interior
    offsets' windows for locally monotone mappings (the mapping's
    variation over a <=1px offset square is its local derivative — exactly
    what the union measures; degenerate folding tiles overflow and are
    patched regardless).
    """
    if n_samples <= 1:
        return ((0.0, 0.0),)
    offs = remap_ops.supersample_offsets(n_samples)
    lo, hi = float(offs[0]), float(offs[-1])
    return ((lo, lo), (lo, hi), (hi, lo), (hi, hi))


def supported(src, in_lens, out_lens, interp: str, n_samples: int) -> bool:
    """Static eligibility (runtime window overflow falls back via lax.cond)."""
    if interp not in ("nearest", "bilinear", "bicubic"):
        return False
    if src.ndim != 3 or src.shape[2] > 8:
        return False
    if src.shape[0] < 2 or src.shape[1] < 2:
        return False
    return True


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# (tile_rows, n_groups, rb) candidate grid. n_groups bounds the 8-row
# SUB-TILE span (each sub-tile rolls its own window start), so smooth
# mappings fit 1-2 groups and the 100-200-row tile spans of fisheye<->
# equirect polar arcs only need groups for their per-8-row slope (a
# taller rb keeps the whole tile inside one 2*rb block).
_TILING_CANDIDATES = tuple(
    (tr, ng, rb)
    for tr in (8, 16, 24, 32, 48, 64)
    for ng, rb in (
        # Short rows windows (DMA fetch: usable span is 2*rb - 8, so
        # rb=16/24 admit the smooth-mapping spans the page grid needed
        # rb=40 for, at half the roll/fetch height).
        (1, 16), (2, 16), (1, 24), (2, 24),
        (1, 40), (2, 40), (3, 40),
        (2, 80), (3, 80), (5, 80), (8, 80),
        (4, 160), (7, 160), (10, 160), (13, 160),
    )
) + (
    # Whole-tile-span windows for violently oscillating mappings (e.g. a
    # raw-radians fisheye fov) whose 8-row sub-spans blow past the grid:
    # at tile_rows 8/16 these degenerate gracefully toward the round-1
    # whole-tile design (few sub-tiles, many groups).
    (8, 10, 80), (16, 10, 80), (8, 20, 160), (16, 20, 160),
)

# tr=128 candidates (ng=1 only): halves the ww2 per-tile fixed share
# (the fitted 1450 ns is 40% of the tr=64 headline bill) at 16 unrolled
# sub-tiles per tile body. Hardware-gated separately (_T128_CANDIDATES
# join the sweep only when dispatch.t128_verified() — the unroll depth
# and SC=40 scalar layout are exactly the compile-feasibility territory
# where Mosaic scoped-VMEM blowups live, so an unprobed tr=128 pick
# must be impossible).
_T128_CANDIDATES = ((128, 1, 24), (128, 1, 32), (128, 1, 40))

# Cost-model constants (ns per scanned column unless noted; fitted to v5e
# measurements of the DMA-fetch kernel at C=3 — headline 1348 Mpix/s at
# tr=64/ng=1/rb=24 ~ 188 ns/col; plus the tr=32 rb=16/40, nearest, and
# ng=2 ablations. The dominant term is the per-(column, channel,
# sub-tile) distribution chain (slice + broadcast + weight FMA), which
# scales with the channel count; taps and rolls are comparatively cheap.
# Ranking-only; the runtime prepass guards exactness.
_PATCH_NS_PER_PX = 28.7   # XLA-gather sampling of overflow tiles (ns/px;
                          # measured 28.81 cfg2 / 28.64 cfg4, r4 battery
                          # `git 878b492` fit.log)
_PX_PATCH_NS_PER_PX = 113.0  # PIXEL-granular patch (ns per patched px):
                          # the same sampling driven by an UNSTRUCTURED
                          # (N,) coordinate list plus a per-pixel scatter,
                          # measured r5 battery (cfg2px/cfg4px_r5.log):
                          # cfg2 3ch wrap 113.0 (1.57M px), cfg4 4ch
                          # clamp 68.2 (1.37M px) — ~2.4-3.9x the block
                          # patch's 28.7, the individual-index scatter
                          # dominating. Ranking-only (worst measured):
                          # plan_with_rescue enables the pixel list only
                          # when n_invalid * this < n_block_px * block.
_RESCUE_NS_PER_PX = 23.7  # inert placeholder cost reported when no rescue
                          # entry applies (f_resc=0 rides with it); ranking
                          # uses rescue_cost_ns_per_px(ng, g, C, taps) per
                          # RESCUE_LADDER entry (fitted, see its docstring)
_KERNEL_BASE_NS = 14.0    # per-column loop/fetch share
_KERNEL_ROLL_NS = 1.8     # per-sub-tile roll per column (x rb/40)
_KERNEL_COLW_NS = 5.77    # per-sub-tile per-CHANNEL distribution chain
_KERNEL_GROUP_NS = 0.15   # per (group x tap x channel) gather work
_KERNEL_GROUP_NS2 = 0.13  # superlinear group penalty (register pressure)
_SU_LIVE_BUDGET = 4096    # max ng*taps*su*n_sub (scoped-VMEM compile bound)
_DEBUG_COSTS = None       # set to a list to record every candidate's
                          # (cost, tr, ng, rb, su, cb, f_patch, f_resc)
                          # from the next suggest_tiling call (fit aid)
# ww2 per-tile fixed share (DMA issue + per-sub-tile rolls), ns — solved
# EXACTLY from the four r4b on-chip triples (cfg3t128_r4b.log: 64:1:16 =
# 2342.4, 64:1:32 = 2086.4, 128:1:24 = 2295.2, 128:1:32 = 2385.9 Mpix/s;
# body fixed at the 0.261 ns/px fit below):
#   T(tr, rb) = T0 + TR*tr + RB*rb + NP2*[2*rb not a power of two]
# The rb slope is the rolled-window height (each sub-tile rolls a 2*rb
# window into place); the NP2 penalty is the one structure that fits the
# (128, 24) point being SLOWER than (128, 32) while (64, 16) beats
# (64, 32): a non-power-of-two roll height costs an extra shuffle stage,
# whereas bandwidth-style models predict monotone-in-rb at every height.
# Ranking-only (the prepass admission guards exactness); round-4's
# single constant (1450, tr=48/64 solve `git 878b492`) lives on as the
# tr=64/rb~16 value of this surface.
_WW2_TILE_T0 = 127.6
_WW2_TILE_TR_NS = 12.54
_WW2_TILE_RB_NS = 26.81
_WW2_TILE_NP2_NS = 486.1


def ww2_tile_ns(tr: int, rb: int) -> float:
    """Fitted ww2 per-tile fixed share (ns) — see constants above."""
    t = _WW2_TILE_T0 + _WW2_TILE_TR_NS * tr + _WW2_TILE_RB_NS * rb
    h = 2 * rb
    if h & (h - 1):
        t += _WW2_TILE_NP2_NS
    return t


def ww2_cost_ns_per_px(g: int, taps: int, c: int) -> float:
    """Modeled two-step-gather body cost per pixel (ns), ng=1.

    Op counts from ops/pallas/ww2.py's structure: C*(taps+2) lane
    gathers (chunk chains add 2 ops each past g=1), taps*(C*(taps+2)+1)
    sublane gathers, 2 selects + 2 FMAs per (c, n, m). Weights: lane
    gathers ~5x an average vector op, sublane ~1.5x (op_model.py /
    gather_cost_probe.py), 0.64 ns per average op — FITTED with
    ww2_tile_ns from the cfg3 ww2 on-chip points (`git 878b492` +
    r4b cfg3t128): body 0.261 ns/px at (g=1, bicubic, C=3), model
    420 op-units. Ranking-only: the prepass admission guards exactness.
    """
    lane = c * (taps + 2) * (1 + 2 * (g - 1))
    sub = taps * (c * (taps + 2) + 1)
    rest = 4 * taps * taps * c + 24
    return (5.0 * lane + 1.5 * sub + rest) / 1024.0 * 0.64


def suggest_tiling(
    in_lens: LensSpec,
    out_lens: LensSpec,
    in_h: int,
    in_w: int,
    out_h: int,
    out_w: int,
    rotation_np,
    interp: str,
    channels: int = 3,
    with_rescue: bool = True,
) -> Tuple[int, int, int, int, int]:
    """Host-side heuristic -> (tile_rows, n_groups, rb, scan_unroll, cb).

    Taller tiles amortize per-column fetches; more groups (and a taller
    row-block ``rb``) admit taller row spans at extra gather cost.
    ``scan_unroll`` sizes the scan step to the config's typical column
    window (p95, rounded to 8) so minifying configs don't pay a 32-column
    step for 10-column windows and most tiles scan exactly once.

    Evaluates the coordinate field on a decimated numpy grid, estimates
    each candidate's overflow-tile fraction (those get chunk-patched at
    ~XLA-gather cost), and picks the candidate minimizing modeled cost.
    Degenerate tiles (FOV boundaries, pole annuli) are expected and
    patched; they must not force the whole config onto a conservative
    tiling or the XLA path. Conservative: the device prepass still guards
    exactness, so a wrong suggestion costs performance, never correctness.
    """
    try:
        step = max(1, out_w // 256)
        cols = np.arange(0, out_w, step, dtype=np.float32)
        rows = np.arange(0, out_h, 2, dtype=np.float32)
        cx = (cols + np.float32(0.5)) - np.float32(out_w * 0.5)
        cy = (rows + np.float32(0.5)) - np.float32(out_h * 0.5)
        rot = None if rotation_np is None else np.asarray(rotation_np, np.float32)
        sx, sy = remap_ops.source_coords(
            in_lens, out_lens, in_h, in_w, cx[None, :], cy[:, None],
            rot, out_h, out_w, xp=np,
        )
        sy = np.broadcast_to(sy, (rows.size, cols.size))
        wrap = wrap_mode_for_input(in_lens)
        sx = np.broadcast_to(sx, (rows.size, cols.size))
        if wrap:
            sx = np.mod(sx, np.float32(in_w))
        else:
            # Clamp-mode taps collapse outside the frame on the device;
            # leaving coordinates unclamped here inflates border-tile
            # windows and mis-marks them as overflow.
            sx = np.clip(sx, 0.0, in_w - 1.0)
        sx = np.clip(sx, -4.0, in_w + 4.0)
        taps = {"nearest": 1, "bilinear": 2, "bicubic": 4}[interp]
        # Exact per-sample row-tap extremes (trunc + clamp), as the device
        # prepass computes them — point extremes + additive slack over-mark
        # clamped border tiles.
        off_lo, off_hi = {"nearest": (0.5, 0.5), "bilinear": (0.0, 1.0),
                          "bicubic": (-1.0, 2.0)}[interp]
        ty_lo = np.clip(np.trunc(sy + np.float32(off_lo)), 0, in_h - 1)
        ty_hi = np.clip(np.trunc(sy + np.float32(off_hi)), 0, in_h - 1)

        # Per 8-output-row band (rows sampled every 2 -> 4 samples/band),
        # per 128-col tile column: row/col extremes, vectorized.
        bnd = 4
        cchunk = max(1, -(-TC // step))  # samples per 128-col tile

        def _pad_group(a, g, axis):
            n = a.shape[axis]
            rem = (-n) % g
            if rem:
                pad = [(0, 0), (0, 0)]
                pad[axis] = (0, rem)
                a = np.pad(a, pad, mode="edge")
            return a

        tylo_g = _pad_group(_pad_group(ty_lo, bnd, 0), cchunk, 1)
        tyhi_g = _pad_group(_pad_group(ty_hi, bnd, 0), cchunk, 1)
        sx_g = _pad_group(_pad_group(sx, bnd, 0), cchunk, 1)
        nb, nc = tylo_g.shape[0] // bnd, tylo_g.shape[1] // cchunk
        tylo_g = tylo_g.reshape(nb, bnd, nc, cchunk)
        tyhi_g = tyhi_g.reshape(nb, bnd, nc, cchunk)
        sx_g = sx_g.reshape(nb, bnd, nc, cchunk)
        bmin = tylo_g.min(axis=(1, 3))  # (nb, nc) per-band row-tap extremes
        bmax = tyhi_g.max(axis=(1, 3))
        cmin = sx_g.min(axis=(1, 3))
        cmax = sx_g.max(axis=(1, 3))
        # Seam tiles: emulate the prepass monotonize (cols below W/2 get +W).
        if wrap:
            sx_adj = np.where(sx_g < in_w / 2, sx_g + in_w, sx_g)
            cmin_a = sx_adj.min(axis=(1, 3))
            cmax_a = sx_adj.max(axis=(1, 3))

        margin = _margin_for(interp)
        slack = taps + 2 * margin + 2
        # Per-launch rescue fixed cost, expressed per frame pixel so the
        # sim's fraction-space savings can subtract it (a rescue saving
        # that does not clear the launch overhead is a net loss).
        launch_px = _RESCUE_LAUNCH_NS / float(max(1, out_h * out_w))

        # The two-step-gather whole-window body is admitted as a
        # candidate only with on-chip verification evidence for the
        # current kernel sources INCLUDING the battery's ww2 cases
        # (dispatch.ww2_verified; tracked separately from the rescue
        # attestation): a stale or ww2-failing marker falls back to the
        # scan body, never to an unattested fast path.
        from .. import dispatch as _dispatch

        ww2_allowed = _dispatch.ww2_verified()
        t128_allowed = _dispatch.t128_verified()

        # Flattened per-sample fields for the sheared-prepass simulation.
        tylo_s = tylo_g.transpose(0, 2, 1, 3)  # (nb, nc, bnd, cchunk)
        tyhi_s = tyhi_g.transpose(0, 2, 1, 3)
        sx_s = sx_g.transpose(0, 2, 1, 3)
        if wrap:
            sx_s_adj = np.where(sx_s < in_w / 2, sx_s + in_w, sx_s)

        def candidate_stats(tr, ng, rb, cbb):
            q = max(1, tr // 8)
            nt = -(-nb // q)

            def tgroup(a, op):
                g = _pad_group(a, q, 0).reshape(nt, q, nc)
                return (g.min if op == "min" else g.max)(axis=1)

            # Row fit: the DMA window base quantizes to 8 rows, so the
            # whole tile's TAP-extreme span (t_span already spans the
            # taps — ty_lo/ty_hi) fits iff span + 2*margin + 1 + 7 <=
            # 2*rb (the old page grid only guaranteed ~rb rows).
            t_span = tgroup(bmax, "max") - tgroup(bmin, "min")
            blk_over = t_span + 2 * margin + 8 > 2 * rb
            # Column window: the scan start is exact (per-step lane
            # rolls), bounded only by the scan budget (~2*cbb columns;
            # the per-chunk verification budget is applied in sim()).
            c_span = tgroup(cmax, "max") - tgroup(cmin, "min")
            cmin_t = tgroup(cmin, "min")
            if wrap:
                c_span_a = tgroup(cmax_a, "max") - tgroup(cmin_a, "min")
                use_adj = c_span > in_w / 2
                c_span = np.where(use_adj, c_span_a, c_span)
                cmin_t = np.where(use_adj, tgroup(cmin_a, "min"), cmin_t)
            col_over = c_span + slack > 2 * cbb
            window = c_span + slack  # scanned-column count per good tile
            if float((blk_over | col_over).mean()) > 0.55:
                return [(1.0, SCAN_UNROLL, float(cbb), 1.0, 0.0,
                         _RESCUE_NS_PER_PX)]  # dead
            # The unrolled scan step's live values scale with
            # ng*taps*su*n_sub; past ~10k the Mosaic stack allocator blows
            # the 16MB scoped-VMEM limit at COMPILE time (no runtime
            # fallback possible), so cap the product well below it. Tall
            # rb=160 blocks add their own scoped pressure (observed:
            # ng*taps*su*n_sub=2560 at rb=160 OOMs where 2048 compiles);
            # halve the budget there.
            budget = _SU_LIVE_BUDGET // (2 if rb >= 160 else 1)
            su_cap = max(8, (budget // (ng * taps * max(1, tr // 8))) // 8 * 8)
            pre = ~(blk_over | col_over)
            if pre.any():
                su95 = int(np.quantile(window[pre], 0.95))
                su95 = min(64, su_cap, max(8, _ceil_to(su95, 8)))
            else:
                su95 = min(SCAN_UNROLL, su_cap)

            # tile-grouped sample views: (nt, q, nc, bnd, cchunk)
            sxx = sx_s_adj if wrap else sx_s

            def sgroup(a):
                return _pad_group(
                    a.reshape(nb, nc * bnd * cchunk), q, 0
                ).reshape(nt, q, nc, bnd, cchunk)

            sxg = sgroup(sxx)
            sylo_g = sgroup(tylo_s)
            syhi_g = sgroup(tyhi_s)

            # Pass-2 rescue admission, simulated per sub-tile for EVERY
            # ladder budget (the plan picks per config via
            # choose_rescue_budgets, so the sim must mirror that): each
            # entry's admitted mask rides with its modeled per-pixel
            # cost; sim() then picks the savings-maximizing entry
            # against the candidate's own bad set.
            if with_rescue:
                rspan = syhi_g.max(axis=(3, 4)) - sylo_g.min(axis=(3, 4))
                cext = sxg.max(axis=(3, 4)) - sxg.min(axis=(3, 4))
                resc_entries = []
                for r_ng, r_g in RESCUE_LADDER:
                    if not rescue_feasible(r_ng, r_g, channels, taps):
                        continue
                    cost_r = rescue_cost_ns_per_px(r_ng, r_g, channels, taps)
                    if cost_r >= _PATCH_NS_PER_PX:
                        continue
                    fit = (
                        (rspan + 2 * margin + 1 <= r_ng * 8)
                        & ((cext + slack) * channels <= r_g * 128)
                    )  # (nt, q, nc)
                    resc_entries.append((fit, cost_r))
            else:
                resc_entries = None

            def sim(su):
                # Simulate the device prepass's sheared per-chunk
                # verification on the sampled grid: scatter per-band row
                # extremes into scan chunks, fit the linear drift from the
                # endpoint chunks, and check every chunk's residual against
                # ng*8 — the same computation _prepass performs exactly.
                nch = min(32, -(-2 * cbb // su))
                j_s = (sxg - cmin_t[:, None, :, None, None]) / su
                j_s = np.clip(j_s.astype(np.int64), 0, nch - 1)
                big = np.float32(1 << 28)
                flat_idx = (
                    (np.arange(nt)[:, None, None, None, None] * q
                     + np.arange(q)[None, :, None, None, None]) * nc
                    + np.arange(nc)[None, None, :, None, None]
                ) * nch + j_s
                rminc = np.full(nt * q * nc * nch, big, np.float32)
                rmaxc = np.full(nt * q * nc * nch, -big, np.float32)
                np.minimum.at(rminc, flat_idx.ravel(), sylo_g.ravel())
                np.maximum.at(rmaxc, flat_idx.ravel(), syhi_g.ravel())
                rminc = rminc.reshape(nt, q, nc, nch)
                rmaxc = rmaxc.reshape(nt, q, nc, nch)
                valid = rminc < big
                jj = np.arange(nch)
                j_first = np.where(valid, jj, nch).min(axis=-1)
                j_last = np.where(valid, jj, -1).max(axis=-1)
                r_first = np.where(jj == j_first[..., None], rminc, big).min(-1)
                r_last = np.where(jj == j_last[..., None], rminc, big).min(-1)
                d = (r_last - r_first) / np.maximum(j_last - j_first, 1)
                rel = rminc - jj * d[..., None]
                shift0 = np.where(valid, rel, big).min(-1)
                resid = np.where(
                    valid, rmaxc - jj * d[..., None] - shift0[..., None], -big
                ).max(-1)
                # resid is already a TAP-extreme span; rows are sampled
                # every 2, so extend by a derivative estimate for the
                # unsampled rows, then apply the device's 2*margin + 1
                # (see _prepass ok_span).
                deriv = np.maximum(resid - (taps - 1), 0.0) / 3.0
                sub_bad = resid + deriv + 2 * margin + 1 > ng * 8
                sub_over = sub_bad.max(axis=1) > 0
                over = sub_over | blk_over | col_over | (window > nch * su)
                good = ~over
                scanned = (
                    float((np.ceil(window[good] / su) * su).mean())
                    if good.any() else float(cbb)
                )
                # Per-sub-tile accounting (the kernel patches 8-row
                # units): a sub-tile is bad when its span overflows OR
                # its tile's shared window fails entirely.
                tile_bad = (blk_over | col_over | (window > nch * su))
                sub_bad_full = sub_bad | tile_bad[:, None, :]
                f_resc, resc_cost = 0.0, _RESCUE_NS_PER_PX
                if resc_entries:
                    best_sav = 0.0
                    for fit, cost_r in resc_entries:
                        fr = float((sub_bad_full & fit).mean())
                        sav = fr * (_PATCH_NS_PER_PX - cost_r) - launch_px
                        if sav > best_sav:
                            best_sav, f_resc, resc_cost = sav, fr, cost_r
                f_patch = float(sub_bad_full.mean()) - f_resc
                return (float(over.mean()), su, scanned, f_patch, f_resc,
                        resc_cost)

            # Smaller chunks shear finer (fewer bad tiles) at more loop
            # steps; evaluate both the p95 window and a 32-column step.
            out = [sim(su95)]
            alt = min(32, su_cap)
            if alt != su95:
                out.append(sim(alt))

            # ---- ww2 candidates (two-step-gather whole-window) ----
            # ng=1 only (the body's sublane gather reaches 8 rows); a
            # sub-tile is additionally bad when its per-column tap-0
            # spread across the 8 rows exceeds 1 or its taps are not
            # consecutive (trunc-toward-zero duplicates at sx in [0,1)
            # for bicubic, clamp collapse at the right border) — the
            # ops/pallas/ww2.py exactness contract, which the device
            # prepass enforces exactly.
            if ng == 1 and ww2_allowed and cbb == CB:
                tap0 = np.trunc(sxx + np.float32(off_lo))
                spr_bad = (
                    tap0.max(axis=2) - tap0.min(axis=2) >= 2
                )  # (nb, nc, cchunk)
                noncons = np.zeros_like(spr_bad)
                if taps == 4:
                    noncons |= (sx_s < 1.0).any(axis=2)
                if not wrap:
                    noncons |= (sx_s >= in_w - taps).any(axis=2)
                band_bad = (spr_bad | noncons).any(axis=-1)  # (nb, nc)
                sub_bad_w = _pad_group(band_bad, q, 0).reshape(nt, q, nc)
                for gch in (1, 2):
                    cap_cols = (gch * 128) // channels - slack
                    if cap_cols <= 0:
                        continue
                    over_w = blk_over | (window > cap_cols)
                    sub_bad_full = sub_bad_w | over_w[:, None, :]
                    f_resc, resc_cost = 0.0, _RESCUE_NS_PER_PX
                    if resc_entries:
                        best_sav = 0.0
                        for fit, cost_r in resc_entries:
                            fr = float((sub_bad_full & fit).mean())
                            sav = (fr * (_PATCH_NS_PER_PX - cost_r)
                                   - launch_px)
                            if sav > best_sav:
                                best_sav, f_resc, resc_cost = sav, fr, cost_r
                    f_patch = float(sub_bad_full.mean()) - f_resc
                    out.append((float(over_w.mean()), -(_WW2_BASE + gch),
                                float(cap_cols), f_patch, f_resc,
                                resc_cost))
            return out

        # Pick the candidate minimizing modeled per-pixel cost: overflow
        # tiles are patched at ~XLA-gather cost, fitting tiles pay the scan
        # kernel (per scanned column: a share of the fetch plus one roll +
        # ng*taps gathers + column weights per 8-row sub-tile). Hard-cap
        # the overflow fraction just under the kernel's 60% runtime patch
        # limit (sampled spans are noisy).
        best = None
        cands = _TILING_CANDIDATES
        if t128_allowed:
            cands = cands + _T128_CANDIDATES
        for tr, ng, rb in cands:
            if ng > _max_groups(rb):
                continue
            # cb only bounds column-window ADMISSION under the DMA fetch
            # (the scratch is sized by scan_unroll, not cb): a 512-column
            # budget admits wide radial-stretch windows at a mild prepass
            # tax (the 0.15 nudge below).
            cb_opts = [CB, 2 * CB]
            for cbb in cb_opts:
                for f, su, scanned, f_patch, f_resc, resc_cost in candidate_stats(
                        tr, ng, rb, cbb):
                    # The runtime 60% patch cap applies AFTER the rescue
                    # pass takes its share.
                    if f_patch > 0.55:
                        continue
                    n_sub = max(1, tr // 8)
                    if su < 0:
                        # ww2 candidate: whole-window two-step-gather
                        # body — no scan, a per-tile fixed share plus
                        # the modeled gather cost.
                        gch = -su - _WW2_BASE
                        kern = (ww2_cost_ns_per_px(gch, taps, channels)
                                + ww2_tile_ns(tr, rb) / (tr * TC))
                    else:
                        grp_ns = (_KERNEL_GROUP_NS
                                  + _KERNEL_GROUP_NS2 * ng) * channels
                        # Roll cost scales with the rolled window height
                        # (2*rb sublanes; fitted at rb=40); the
                        # distribution chain scales with the channel
                        # count (fitted at 3).
                        col_ns = _KERNEL_BASE_NS + n_sub * (
                            _KERNEL_ROLL_NS * (rb / RB)
                            + grp_ns * ng * taps
                            + _KERNEL_COLW_NS * channels
                        )
                        kern = scanned * col_ns / (tr * TC)
                        # Bigger scan budgets tax the prepass; nudge so
                        # cb=512 only wins when it meaningfully cuts
                        # overflow.
                        kern *= 1.0 + 0.15 * (cbb // CB - 1)
                    # The sim over-marks overflow by design (decimated
                    # grid + derivative slack); the device prepass is the
                    # exact arbiter. Forgive sub-1% sim fractions so
                    # sampling noise cannot veto a faster tiling
                    # (measured: the sim read 1.2% on a config whose real
                    # prepass marks zero tiles).
                    f_patch_eff = max(0.0, f_patch - 0.01)
                    cost = (
                        f_patch_eff * _PATCH_NS_PER_PX
                        + f_resc * resc_cost
                        + (launch_px if f_resc > 0 else 0.0)
                        + max(0.0, 1.0 - f_patch_eff - f_resc) * kern
                    )
                    if _DEBUG_COSTS is not None:
                        _DEBUG_COSTS.append(
                            (cost, tr, ng, rb, su, cbb, f_patch, f_resc)
                        )
                    # Candidates iterate tr-ascending; a TALLER tile must
                    # beat the incumbent by >3% to displace it — modeled
                    # margins inside that band are noise, and the shorter
                    # tile is the measured-region choice (the 1474 Mpix/s
                    # headline ran tr=48 with (64,1,16) modeled 2% ahead).
                    # Same-or-shorter tile_rows compare unmargined so the
                    # pick stays the modeled argmin within a height.
                    # EXCEPTION: ww2-displacing-ww2 uses 1% — both tile
                    # heights are anchored to on-chip fit points (the r4b
                    # cfg3t128 battery ran tr=64 AND tr=128 ww2), so the
                    # unprobed-territory hysteresis would veto the
                    # measured-faster (128,1,32) pick (2385.9 vs 2342.4,
                    # +1.9% — inside 3%, outside 1%).
                    if best is not None and tr > best[1]:
                        disp = 0.99 if (su < 0 and best[4] < 0) else 0.97
                    else:
                        disp = 1.0
                    if best is None or cost < best[0] * disp:
                        best = (cost, tr, ng, rb, su, cbb)
        if best is not None:
            return best[1], best[2], best[3], best[4], best[5]
    except Exception as e:
        # Correctness-safe (the device prepass still guards exactness) but
        # a cost-model regression silently degrading every config to the
        # default tiling must be visible (VERDICT r2 weak #4).
        key = (type(in_lens).__name__, type(out_lens).__name__, interp,
               in_h, in_w, out_h, out_w)
        if key not in _tiling_fallback_warned:
            _tiling_fallback_warned.add(key)
            print(
                "Warning: tiling cost model failed "
                f"({type(e).__name__}: {e}); using default tiling "
                f"(tile_rows=8, n_groups=2, rb={RB}) for "
                f"{key[0]}->{key[1]} {interp} {in_w}x{in_h}->{out_w}x{out_h}",
                file=sys.stderr,
            )
    return 8, 2, RB, SCAN_UNROLL, CB


def _lanes_for(w_pad: int, c: int) -> int:
    """Lane width of the padded interleaved source: 128-multiple with
    >= 256 lanes of slack past the last column (DMA windows are
    128-aligned and W_WIN <= scan lanes + 256)."""
    return _ceil_to(w_pad * c + 256, 128)


def _w_win(scan_unroll: int, c: int) -> int:
    """DMA window lane width: covers SU*C scan lanes at any misalignment
    (the fetch start is rounded down to a 128-lane boundary)."""
    return _ceil_to(scan_unroll * c + 128, 128)


def _pad_source(src_hwc: Array, wrap: bool, rb: int = RB, cb: int = CB) -> Tuple[Array, int, int]:
    """Pad (H, W, C) with clamp/wrap margins -> interleaved (h_pad, Wl).

    Row-major interleaved lanes: padded column j, channel c at lane
    j*C + c. Index mapping: padded row = clamped source row + PAD;
    padded col = (monotonized) source col + PAD. The kernel keeps this
    array in HBM and DMAs (2*rb, W_WIN) scan windows from it at dynamic
    offsets (8-aligned rows, 128-aligned lanes — the Mosaic DMA
    alignment rules), so the lane dim is padded per ``_lanes_for``.
    """
    h, w, c = src_hwc.shape
    # rows: replicate top/bottom edges (y always clamps)
    top = jnp.repeat(src_hwc[:1], PAD, axis=0)
    bot_extra = _ceil_to(h + 2 * PAD, rb) - (h + PAD)
    h_pad = h + PAD + bot_extra
    if h_pad < 2 * rb:
        bot_extra += 2 * rb - h_pad
        h_pad = 2 * rb
    bot = jnp.repeat(src_hwc[-1:], bot_extra, axis=0)
    x = jnp.concatenate([top, src_hwc, bot], axis=0)

    if wrap:
        left = x[:, -PAD:]  # wrapped continuation (left pad unused in wrap)
        right_margin = cb + 2 * PAD + 2 * MARGIN
        reps = -(-right_margin // w)
        right = jnp.concatenate([x[:, :w]] * reps, axis=1)[:, :right_margin]
    else:
        left = jnp.repeat(x[:, :1], PAD, axis=1)
        right = jnp.repeat(x[:, -1:], PAD, axis=1)
    x = jnp.concatenate([left, x, right], axis=1)
    w_now = x.shape[1]
    w_pad = max(_ceil_to(w_now, cb), 2 * cb)
    if w_pad > w_now:
        x = jnp.concatenate(
            [x, jnp.repeat(x[:, -1:], w_pad - w_now, axis=1)], axis=1
        )
    flat = x.reshape(h_pad, w_pad * c)
    wl = _lanes_for(w_pad, c)
    if wl > w_pad * c:
        flat = jnp.concatenate(
            [flat, jnp.zeros((h_pad, wl - w_pad * c), flat.dtype)], axis=1
        )
    return flat, h_pad, w_pad


def _field_taps(
    in_lens, out_lens, in_h, in_w, out_h, out_w,
    rotation, off_x, off_y, interp, wrap, n_ty, n_tx, tile_rows, row0=0,
):
    """Coordinate field + tap indices on the TR/TC-padded output grid.

    ``row0`` offsets the band's global output row (spatial sharding: each
    device computes rows [row0, row0 + n_ty*tile_rows) of the full image).
    Edge tiles beyond out_h/out_w replicate the last real pixel's
    coordinates so their windows stay bounded by real content.
    """
    rows = jnp.minimum(
        row0
        + jax.lax.broadcasted_iota(jnp.int32, (n_ty * tile_rows, n_tx * TC), 0),
        out_h - 1,
    )
    cols = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (n_ty * tile_rows, n_tx * TC), 1),
        out_w - 1,
    )
    cx = (cols.astype(jnp.float32) + jnp.float32(0.5)) - jnp.float32(
        out_w * 0.5
    ) + jnp.float32(off_x)
    cy = (rows.astype(jnp.float32) + jnp.float32(0.5)) - jnp.float32(
        out_h * 0.5
    ) + jnp.float32(off_y)
    # kxp (not jnp): the window must bound the taps the KERNEL computes,
    # and the kernel evaluates the lens math with kxp's polynomial inverse
    # trig — using the same formulas here keeps prepass and kernel
    # coordinates coherent to compiler-fusion-level drift (see _margin_for).
    sx, sy = remap_ops.source_coords(
        in_lens, out_lens, in_h, in_w, cx, cy, rotation, out_h, out_w, xp=kxp
    )
    xt = taps_mod.x_taps(sx, in_w, interp, wrap, xp=jnp)
    yt = taps_mod.y_taps(sy, in_h, interp, xp=jnp)
    return xt, yt


def _tile_reduce(field: Array, n_ty: int, n_tx: int, op: str, tile_rows: int) -> Array:
    r = field.reshape(n_ty, tile_rows, n_tx, TC)
    return (jnp.min if op == "min" else jnp.max)(r, axis=(1, 3))


def _subtile_reduce(field: Array, n_ty: int, n_tx: int, op: str, tile_rows: int) -> Array:
    """Reduce per 8-row sub-tile -> (n_ty, n_sub, n_tx)."""
    n_sub = tile_rows // 8
    r = field.reshape(n_ty, n_sub, 8, n_tx, TC)
    return (jnp.min if op == "min" else jnp.max)(r, axis=(2, 4))


def _piece_reduce(field: Array, n_ty: int, n_tx: int, op: str,
                  tile_rows: int, k: int) -> Array:
    """Reduce per (8-row, TC/k-col) sub-tile piece -> (n_ty, n_sub, n_tx, k)."""
    n_sub = tile_rows // 8
    r = field.reshape(n_ty, n_sub, 8, n_tx, k, TC // k)
    return (jnp.min if op == "min" else jnp.max)(r, axis=(2, 5))


def split_ok_static(r_g: int, channels: int) -> bool:
    """Static availability of the 2-piece split rescue at g gather vregs.

    Each piece's window occupies g*64 lanes, which must be 128-aligned
    for the per-piece DMA (g even) and divide evenly into texel columns
    (g*64 % channels == 0 — the piece-B gather offset folds into the
    per-pixel column base as (g*64)//channels texels)."""
    half_l = r_g * 128 // 2
    return r_g % 2 == 0 and half_l % max(channels, 1) == 0


def split_feasible(r_g: int, channels: int, taps: int) -> bool:
    """Can the SPLIT launch COMPILE at these budgets? (measured, v5e r5f)

    The split body is the whole-rescue gather stack plus per-half lane/
    vertical rolls and lane-half selects — enough extra scoped-VMEM
    stack to flip marginal combos: (8,6) bilinear C3 verified exact on
    chip (`verify_r5f.log` SPLIT bl), but (8,6) BICUBIC C3 — whose
    whole-rescue twin is an OK anchor — hard-fails Mosaic compile
    (HTTP 500, same log). Conservative probed-or-dominated region:
    taps <= 2 (nearest/bilinear) at C <= 3; C >= 4 is unprobed (the
    r5f battery timed out before its 4ch case) and stays rejected."""
    return (taps <= 2 and channels <= 3
            and split_ok_static(r_g, channels))


def _px_patch_sizes(n_px: int) -> Tuple[int, int, int]:
    """Static chunk sizing for the PIXEL-granular patch loop.

    Shared by the launch (inline-mask path) and compact_valid_px (the
    plan-time precompaction) so a precompacted list's length always
    matches the launch's expectation: (px_chunk, max_bad_px,
    cap_padded_px)."""
    px_chunk = max(8 * TC, -(-(n_px // 32) // 1024) * 1024)
    max_bad_px = max(1, int(n_px * 0.60))
    n_chunks_cap_px = -(-max_bad_px // px_chunk)
    return px_chunk, max_bad_px, n_chunks_cap_px * px_chunk


def _rescue_taken(bad: Array, rescue: Array, rescue_cap: int) -> Array:
    """Pass-2 set: bad sub-tiles whose own window fits the rescue
    budgets, capped at rescue_cap in row-major order (overflow beyond
    the cap falls through to the XLA patch). Config-only; shared by the
    launch and the plan-time patch compaction so both see the SAME
    rescued set."""
    resc_ok = jnp.logical_and(bad, rescue[3] > 0)
    flat = resc_ok.reshape(-1)
    return jnp.logical_and(
        flat, jnp.cumsum(flat.astype(jnp.int32)) <= rescue_cap
    ).reshape(resc_ok.shape)


def compact_valid_px(
    bad: Array,
    rescue: Optional[Array],
    rescue_cap: int,
    vpx: Array,
    *,
    tile_rows: int,
) -> Array:
    """Precompact the pixel-granular patch list from a plan (config-only).

    ``bad`` (n_ty, n_sub, n_tx) and ``vpx`` ((n_ty*tile_rows,
    n_tx*TC) bool) come from make_prepass(pixel_valid=True); ``rescue``/
    ``rescue_cap`` must be the SAME the launch will run with (rescued
    sub-tiles are computed exactly by pass 2, so their pixels are not
    patched). Returns an int32 (2, cap_padded_px) stack of (iy, ix)
    output coordinates (band-local), fill value -1 — pass it as
    ``remap_pallas(valid_px=...)``: the launch then skips the
    full-resolution mask + nonzero compaction entirely (it is identical
    every frame of a config's stream)."""
    n_ty, n_sub, n_tx = bad.shape
    if rescue is not None and rescue_cap > 0:
        patch_mask = jnp.logical_and(
            bad, jnp.logical_not(_rescue_taken(bad, rescue, rescue_cap))
        )
    else:
        patch_mask = bad
    bad_px_mask = jnp.logical_and(
        jnp.repeat(
            jnp.repeat(patch_mask, 8, axis=1).reshape(n_ty * tile_rows, n_tx),
            TC, axis=1,
        ),
        jnp.logical_not(vpx),
    )
    _, _, cap_padded_px = _px_patch_sizes(n_ty * tile_rows * n_tx * TC)
    iy, ix = jnp.nonzero(bad_px_mask, size=cap_padded_px, fill_value=-1)
    return jnp.stack([iy, ix]).astype(jnp.int32)


def _prepass(
    in_lens, out_lens, in_h, in_w, out_h, out_w,
    rotation, offsets, interp, wrap, n_ty, n_tx, n_rp, n_cp, tile_rows,
    n_groups, margin=None, row0=0, rb: int = RB, scan_unroll: int = SCAN_UNROLL,
    cb: int = CB, max_chunks: int = 0, ww2: bool = False,
    return_parts: bool = False,
    rescue_channels: int = 0, rescue_budgets=None,
    pixel_valid: bool = False, split_pieces: int = 0,
):
    """Per-tile window scalars + per-SUB-TILE overflow mask (device, XLA).

    The mask is (n_ty, n_sub, n_tx): overflow is patched in 8-row
    sub-tile units, so one folding sub-tile does not force a whole-tile
    resample and the shared DMA/scan windows are placed to cover the
    most sub-tiles rather than the whole-tile extremes.

    ``offsets`` is a sequence of sub-pixel (off_x, off_y) pairs whose tap
    windows are unioned — supersampled runs pass the extreme stratified
    offsets (see _prepass_offsets) so one prepass covers every launch.
    ``margin`` widens the windows (default: drift slack per interp).
    ``max_chunks`` > 0 additionally bounds the scan length to that many
    chunks (the whole-window kernel passes 1: its gather vregs hold one
    chunk, and a single-chunk fit makes the shear drift 0).
    ``ww2`` adds the two-step-gather body's exactness admission
    (ops/pallas/ww2.py contract): consecutive monotonized x-taps and
    per-column tap-0 spread <= 1 across each sub-tile's 8 rows."""
    if margin is None:
        margin = _margin_for(interp)
    fields = [
        _field_taps(
            in_lens, out_lens, in_h, in_w, out_h, out_w,
            rotation, ox, oy, interp, wrap, n_ty, n_tx, tile_rows, row0=row0,
        )
        for ox, oy in offsets
    ]
    # column extremes (unpadded, wrapped space) for seam detection
    xs = jnp.stack([i for xt, _ in fields for i in xt.idx])  # (n_off*n_taps, Hp, Wp)
    cmin_u = _tile_reduce(jnp.min(xs, axis=0), n_ty, n_tx, "min", tile_rows)
    cmax_u = _tile_reduce(jnp.max(xs, axis=0), n_ty, n_tx, "max", tile_rows)
    seam = jnp.logical_and(wrap, (cmax_u - cmin_u) > (in_w // 2))

    seam_px = jnp.repeat(jnp.repeat(seam, tile_rows, axis=0), TC, axis=1)
    xs_m = jnp.stack(
        [
            taps_mod.monotonize_x(i, in_w, seam_px, xp=jnp)
            for xt, _ in fields
            for i in xt.idx
        ]
    ) + PAD
    ys = jnp.stack([i for _, yt in fields for i in yt.idx]) + PAD

    kmin_px = jnp.min(xs_m, axis=0)  # per-pixel tap extremes, padded coords
    kmax_px = jnp.max(xs_m, axis=0)
    ymin_px = jnp.min(ys, axis=0)
    ymax_px = jnp.max(ys, axis=0)
    cmin = _tile_reduce(kmin_px, n_ty, n_tx, "min", tile_rows)
    cmax = _tile_reduce(kmax_px, n_ty, n_tx, "max", tile_rows)
    n_sub = tile_rows // 8
    rmin_sub = _subtile_reduce(ymin_px, n_ty, n_tx, "min", tile_rows)
    rmax_sub = _subtile_reduce(ymax_px, n_ty, n_tx, "max", tile_rows)
    rmin = jnp.min(rmin_sub, axis=1)
    rmax = jnp.max(rmax_sub, axis=1)

    # DMA fetch: the window base quantizes to 8 rows (the Mosaic DMA
    # sublane alignment), not to an rb-page grid — the usable window is
    # 2*rb - 7 rows instead of the old page-fit worst case of ~rb + 1,
    # which nearly doubles the admitted row span per rb.
    h_pad = (n_rp + 1) * rb
    # COVERAGE-MAXIMIZING DMA ROW BASE. Overflow is tracked per 8-row
    # SUB-TILE (each is patched independently), so the tile's shared
    # (2*rb)-row DMA window should cover as many sub-tiles as possible —
    # fitting the whole-tile extremes lets one wild sub-tile (a fold, a
    # FOV boundary) evict every fitting neighbour. Each sub-tile's own
    # 8-aligned base is a candidate; pick the one covering the most.
    base_hi = max(h_pad - 2 * rb, 0)
    r_cand = jnp.clip(((rmin_sub - margin) // 8) * 8, 0, base_hi)
    r_fit = jnp.logical_and(
        rmin_sub[:, None] - margin >= r_cand[:, :, None],
        rmax_sub[:, None] + margin + 1 <= r_cand[:, :, None] + 2 * rb,
    )  # (n_ty, cand, sub, n_tx)
    r_base = jnp.take_along_axis(
        r_cand, jnp.argmax(jnp.sum(r_fit, axis=2), axis=1)[:, None, :], axis=1
    )[:, 0, :]
    # COVERAGE-MAXIMIZING COLUMN WINDOW, same idea along the scan axis:
    # the shared scan range [c_start, c_start + n_scan) is placed to
    # cover the most sub-tiles within the chunk budget.
    su = scan_unroll
    n_chunks = min(32, -(-2 * cb // su))
    budget = min(n_chunks, max_chunks) if max_chunks > 0 else n_chunks
    budget_cols = budget * su
    w_pad = (n_cp + 1) * cb
    cmin_sub = _subtile_reduce(kmin_px, n_ty, n_tx, "min", tile_rows)
    cmax_sub = _subtile_reduce(kmax_px, n_ty, n_tx, "max", tile_rows)
    c_cand = jnp.clip(cmin_sub - margin, 0, max(w_pad - su, 0))
    c_fit = jnp.logical_and(
        cmin_sub[:, None] - margin >= c_cand[:, :, None],
        cmax_sub[:, None] + margin + 1
        <= jnp.minimum(c_cand[:, :, None] + budget_cols, w_pad),
    )
    c_start = jnp.take_along_axis(
        c_cand, jnp.argmax(jnp.sum(c_fit, axis=2), axis=1)[:, None, :], axis=1
    )[:, 0, :]
    covered = jnp.logical_and(
        cmin_sub - margin >= c_start[:, None, :],
        cmax_sub + margin + 1
        <= jnp.minimum(c_start[:, None, :] + budget_cols, w_pad),
    )  # (n_ty, n_sub, n_tx)
    # Scan length: the covered sub-tiles' max extent, padded to the
    # kernel's unroll step (extra columns sit beyond every tap — weights
    # identically zero — and _lanes_for keeps their reads in bounds).
    ext = jnp.max(
        jnp.where(covered, cmax_sub + margin + 1 - c_start[:, None, :], 1),
        axis=1,
    )
    n_scan = ((jnp.maximum(ext, 1) + su - 1) // su) * su
    n_scan = jnp.minimum(n_scan, ((w_pad - c_start) // su) * su)
    n_scan = jnp.maximum(n_scan, su)
    covered = jnp.logical_and(
        covered, cmax_sub + margin + 1 <= c_start[:, None, :] + n_scan[:, None, :]
    )
    # SHEARED SUB-TILE WINDOWS. The kernel rolls each scan step's columns
    # PER 8-ROW SUB-TILE, with the roll shift drifting LINEARLY with the
    # step index: shift_h(step) = shift0_h + step*drift_h. A steep-but-
    # locally-linear mapping (fisheye<->equirect polar arcs, radial FOV
    # stretches) then only needs the group window to cover the residual
    # per-chunk thickness, not the whole tile's row span. The fit is
    # verified EXACTLY per scan chunk below — a chunk whose taps escape
    # the predicted window marks its SUB-TILE bad (patched), so the shear
    # is a pure admission/performance feature.
    big = jnp.int32(1 << 28)
    # Per-pixel scan-chunk range (a pixel's taps span <= 2 chunks).
    c_start_px = jnp.repeat(jnp.repeat(c_start, tile_rows, axis=0), TC, axis=1)
    j_lo = jnp.maximum(kmin_px - c_start_px, 0) // su
    j_hi = jnp.maximum(kmax_px - c_start_px, 0) // su
    rminc, rmaxc = [], []
    for j in range(n_chunks):
        in_chunk = jnp.logical_and(j_lo <= j, j_hi >= j)
        rminc.append(_subtile_reduce(
            jnp.where(in_chunk, ymin_px, big), n_ty, n_tx, "min", tile_rows))
        rmaxc.append(_subtile_reduce(
            jnp.where(in_chunk, ymax_px, -big), n_ty, n_tx, "max", tile_rows))
    rminc = jnp.stack(rminc)  # (n_chunks, n_ty, n_sub, n_tx)
    rmaxc = jnp.stack(rmaxc)
    valid = rminc < big
    jidx = jnp.arange(n_chunks, dtype=jnp.int32).reshape(n_chunks, 1, 1, 1)
    j_first = jnp.min(jnp.where(valid, jidx, n_chunks), axis=0)
    j_last = jnp.max(jnp.where(valid, jidx, -1), axis=0)
    r_first = jnp.min(jnp.where(jidx == j_first[None], rminc, big), axis=0)
    r_last = jnp.min(jnp.where(jidx == j_last[None], rminc, big), axis=0)
    # Round-to-nearest integer slope: floor division loses up to one row
    # per chunk of accumulated fit error, which at fine scan chunks
    # (su=8/16) over-marked more tiles than the finer shear admitted.
    den = jnp.maximum(j_last - j_first, 1)
    drift = (2 * (r_last - r_first) + den) // (2 * den)
    r_base_b = r_base[None, :, None, :]
    rel = rminc - margin - r_base_b - jidx * drift[None]
    shift0 = jnp.min(jnp.where(valid, rel, big), axis=0)
    # Exact per-chunk verification of the sheared windows:
    top = rmaxc + margin + 1 - r_base_b - jidx * drift[None] - shift0[None]
    ok_span = jnp.max(jnp.where(valid, top, -big), axis=0) <= n_groups * 8
    win_lo = shift0[None] + jidx * drift[None]
    ok_lo = jnp.min(jnp.where(valid, win_lo, big), axis=0) >= 0
    ok_hi = jnp.max(
        jnp.where(valid, win_lo + n_groups * 8, -big), axis=0
    ) <= 2 * rb
    # Per-SUB-TILE admission: the sheared chunk windows must fit the group
    # budget and the shared DMA row window, and the sub-tile's taps must
    # lie inside the shared scan range. ok_lo/ok_hi subsume the whole-tile
    # window-fit check (they bound every chunk window inside
    # [r_base, r_base + 2*rb)), so a wild sub-tile no longer evicts its
    # fitting neighbours — it is patched alone.
    ok_sub = ok_span & ok_lo & ok_hi & covered
    if wrap:
        # Monotonized columns must stay inside the physical wrap margin.
        ok_sub = jnp.logical_and(
            ok_sub, cmax_sub <= PAD + in_w + cb + PAD + margin
        )
    if ww2:
        # Two-step-gather exactness admission (ops/pallas/ww2.py): per
        # pixel the monotonized x-taps must be CONSECUTIVE
        # (x_key[m] == x_key[0] + m — fails at trunc-toward-zero
        # duplicates and clamp-collapsed borders), and tap-0's
        # per-column spread across the sub-tile's 8 output rows must be
        # <= 1 so the in-kernel +-1 drift select is exact. Violating
        # sub-tiles are patched/rescued like any other overflow.
        n_taps_f = len(fields[0][0].idx)
        n_sub_w = tile_rows // 8
        ok_w = None
        for o in range(len(fields)):
            tap0 = xs_m[o * n_taps_f]
            cons = None
            for m in range(1, n_taps_f):
                eq = xs_m[o * n_taps_f + m] == tap0 + m
                cons = eq if cons is None else jnp.logical_and(cons, eq)
            t0 = tap0.reshape(n_ty, n_sub_w, 8, n_tx, TC)
            sp_ok = jnp.all(
                jnp.max(t0, axis=2) - jnp.min(t0, axis=2) <= 1, axis=-1
            )  # (n_ty, n_sub, n_tx)
            if cons is not None:
                sp_ok = jnp.logical_and(sp_ok, jnp.all(
                    cons.reshape(n_ty, n_sub_w, 8, n_tx, TC), axis=(2, 4)
                ))
            ok_w = sp_ok if ok_w is None else jnp.logical_and(ok_w, sp_ok)
        ok_sub = jnp.logical_and(ok_sub, ok_w)
    row_shift_sub = jnp.clip(shift0, 0, 2 * rb - 1)  # (n_ty, n_sub, n_tx)
    row_drift_sub = drift
    # Tiles with no usable sub-tile still run through the kernel (their
    # output is fully patched afterwards); clamp their scan length so they
    # cost one unroll step instead of scanning a frame-wide window. The
    # clamp MUST precede the per-pixel exactness model below — vpx's
    # condition A checks taps against the scan length the kernel actually
    # runs, and the pre-clamp length marked pixels of fully-bad tiles
    # kernel-exact that the kernel never computed (ADVICE r4 high).
    n_scan = jnp.where(jnp.any(ok_sub, axis=1), n_scan, su)

    vpx = None
    if pixel_valid and not ww2 and max_chunks == 0:
        # PER-PIXEL kernel exactness (scan body only): a pixel inside a
        # BAD sub-tile is still computed exactly by the kernel iff every
        # condition the sub-tile admission checks holds for ITS OWN taps
        # under the kernel's EFFECTIVE per-step shift
        # (clip(shift0 + step*drift, 0, 2*rb-1) — the clip is what the
        # kernel applies, so the model below uses the clipped value).
        # The pixel-granular patch then resamples only ~vpx pixels of
        # bad sub-tiles instead of whole 8x128 blocks. Direction of
        # error is safe by construction: marking a good pixel invalid
        # costs one extra patched pixel; every condition here is the
        # same-or-stricter per-pixel form of the sub-tile admission
        # (same margins); tests/test_pixel_patch.py pins vpx-patched
        # outputs against the XLA path pixel-exactly, including a
        # config whose tiles have NO usable sub-tile (the n_scan-clamp
        # ordering bug ADVICE r4 found).
        def subpx(a):  # (n_ty, n_sub, n_tx) -> per-pixel
            return jnp.repeat(jnp.repeat(a, 8, axis=1).reshape(
                n_ty * tile_rows, n_tx), TC, axis=1)

        def tilepx(a):  # (n_ty, n_tx) -> per-pixel
            return jnp.repeat(jnp.repeat(a, tile_rows, axis=0), TC, axis=1)

        c_start_p = tilepx(c_start)
        n_scan_p = tilepx(n_scan)
        r_base_p = tilepx(r_base)
        shift0_p = subpx(row_shift_sub)
        drift_p = subpx(drift)
        # A: every x-tap inside the shared scan range.
        ok_px = jnp.logical_and(
            kmin_px - margin >= c_start_p,
            kmax_px + margin + 1 <= c_start_p + n_scan_p,
        )
        # B: every y-tap inside the DMA row block (the roll is cyclic
        # over 2*rb rows — out-of-block taps gather wrapped garbage).
        ok_px &= jnp.logical_and(
            ymin_px - margin >= r_base_p,
            ymax_px + margin + 1 <= r_base_p + 2 * rb,
        )
        # C: at each scan step touching the pixel's taps (taps span <= 2
        # adjacent chunks), every y-tap inside that step's sheared
        # ng*8-row window. ng=1 kernels skip the group-range weight
        # mask entirely, so an out-of-window tap is silently
        # mis-gathered — this check is what makes that impossible.
        jlo_px = jnp.maximum(kmin_px - margin - c_start_p, 0) // su
        jhi_px = jnp.maximum(kmax_px + margin - c_start_p, 0) // su
        for j_px in (jlo_px, jhi_px):
            sh_px = jnp.clip(shift0_p + j_px * drift_p, 0, 2 * rb - 1)
            win_lo = r_base_p + sh_px
            ok_px &= jnp.logical_and(
                ymin_px - margin >= win_lo,
                ymax_px + margin + 1 <= win_lo + n_groups * 8,
            )
        if wrap:
            # Monotonized columns must stay inside the physical wrap
            # margin of the padded source (same bound as the sub-tile
            # check, per pixel).
            ok_px &= kmax_px <= PAD + in_w + cb + PAD + margin
        vpx = ok_px

    rescue = None
    if rescue_channels > 0:
        # Pass-2 admission: each sub-tile gets its OWN whole-window —
        # an 8-aligned row base and an exact column start, checked
        # against the rescue launch's (ng, g) budgets. shift2 aligns the
        # sub-tile's window start to gather row 0 (single shift, no
        # drift: the whole window rides in g vregs). The SAME budgets
        # must be passed to the launch (remap_pallas rescue_budgets).
        r_ng, r_g = rescue_budgets if rescue_budgets else (RESCUE_NG, RESCUE_G)
        hw2 = 2 * _rescue_rb(r_ng)
        r_base2 = jnp.clip(
            ((rmin_sub - margin) // 8) * 8, 0, max(h_pad - hw2, 0)
        )
        shift2 = rmin_sub - margin - r_base2
        span2 = rmax_sub - rmin_sub + 2 * margin + 1
        c_start2 = cmin_sub - margin
        ext2 = cmax_sub - cmin_sub + 2 * margin + 1
        ok2 = (
            (shift2 >= 0)
            & (rmax_sub + margin + 1 - r_base2 <= hw2)
            & (span2 <= r_ng * 8)
            & (shift2 + r_ng * 8 <= hw2)
            & (c_start2 >= 0)
            & (ext2 * rescue_channels <= r_g * 128)
            & (c_start2 + ext2 <= w_pad)
        )
        if wrap:
            ok2 = ok2 & (cmax_sub <= PAD + in_w + cb + PAD + margin)
        rescue = jnp.stack(
            [
                r_base2.astype(jnp.int32),
                c_start2.astype(jnp.int32),
                jnp.clip(shift2, 0, hw2 - 1).astype(jnp.int32),
                ok2.astype(jnp.int32),
            ]
        )  # (4, n_ty, n_sub, n_tx)
    split = None
    if rescue_channels > 0 and split_pieces == 2 and split_feasible(
            r_g, rescue_channels, _interp_taps(interp)):
        # SPLIT-RESCUE admission: each HALF (8 x 64) of a sub-tile gets
        # its own window, checked against HALF the gather-lane budget
        # (the two windows share the launch's g vregs; each piece's
        # window rides in g*64 lanes). The polar-arc configs' marginal
        # sub-tiles have cluster-jump windows (seam monotonization, arc
        # reversals), so their halves' extents are far below ext/2 —
        # measured on cfg2: 60.6% of otherwise-patched sub-tiles fit
        # (8, 6) split where 0% fit it whole (bench/overflow_split_probe).
        # Both halves must fit (the block patch overwrites whole 8x128
        # sub-tiles, so one unfit half forfeits the slot's saving).
        half_l = r_g * 128 // 2
        kmin_p = _piece_reduce(kmin_px, n_ty, n_tx, "min", tile_rows, 2)
        kmax_p = _piece_reduce(kmax_px, n_ty, n_tx, "max", tile_rows, 2)
        ymin_p = _piece_reduce(ymin_px, n_ty, n_tx, "min", tile_rows, 2)
        ymax_p = _piece_reduce(ymax_px, n_ty, n_tx, "max", tile_rows, 2)
        rb_p = jnp.clip(((ymin_p - margin) // 8) * 8, 0, max(h_pad - hw2, 0))
        sh_p = ymin_p - margin - rb_p
        span_p = ymax_p - ymin_p + 2 * margin + 1
        cs_p = kmin_p - margin
        ext_p = kmax_p - kmin_p + 2 * margin + 1
        okp = (
            (sh_p >= 0)
            & (ymax_p + margin + 1 - rb_p <= hw2)
            & (span_p <= r_ng * 8)
            & (sh_p + r_ng * 8 <= hw2)
            & (cs_p >= 0)
            & (ext_p * rescue_channels <= half_l)
            & (cs_p + ext_p <= w_pad)
        )
        if wrap:
            okp = okp & (kmax_p <= PAD + in_w + cb + PAD + margin)
        split = jnp.stack(
            [
                rb_p.astype(jnp.int32),
                cs_p.astype(jnp.int32),
                jnp.clip(sh_p, 0, hw2 - 1).astype(jnp.int32),
                okp.astype(jnp.int32),
            ]
        )  # (4, n_ty, n_sub, n_tx, 2) — distinguishable from rescue by ndim
    # Pack the per-tile scalars into ONE prefetch array with a wide minor
    # dim: SMEM pads the minor dimension to 128 lanes per array, so separate
    # (n_ty, n_tx) arrays would cost SC x the SMEM (exhausts the 1MB SMEM
    # at 4K grid sizes). Layout: (n_ty, n_tx * SC), field i at [ty, tx*SC+i];
    # slot 1 is the tile's 8-aligned DMA row base, slot 2 the exact scan
    # start column (both in padded source coords); slots 6..6+n_sub-1 hold
    # the per-sub-tile roll shifts and slots 6+n_sub..6+2*n_sub-1 their
    # per-step drifts.
    fields = [
        r_base.astype(jnp.int32),
        r_base.astype(jnp.int32),
        c_start.astype(jnp.int32),
        n_scan.astype(jnp.int32),
        seam.astype(jnp.int32),
        jnp.zeros_like(r_base),
    ] + [row_shift_sub[:, h, :].astype(jnp.int32) for h in range(n_sub)] \
      + [row_drift_sub[:, h, :].astype(jnp.int32) for h in range(n_sub)]
    fields += [jnp.zeros_like(r_base)] * (SC - len(fields))
    scalars = jnp.stack(fields, axis=-1).reshape(
        r_base.shape[0], r_base.shape[1] * SC
    )
    if return_parts:
        # Failure decomposition for diagnostics/tests: which admission
        # check rejected each sub-tile (window fit, sheared spans, column
        # coverage).
        parts = {
            "ok_window": jnp.logical_and(
                rmax + margin + 1 - r_base <= 2 * rb,
                rmin - margin - r_base >= 0,
            ),
            "ok_sub": ok_span & ok_lo & ok_hi,  # (n_ty, n_sub, n_tx)
            "covered": covered,
            "span_need": jnp.max(
                jnp.where(valid, top, -big), axis=0
            ),  # rows needed per sub-tile window
            "chunk_thick": jnp.max(
                jnp.where(valid, rmaxc - rminc, -big), axis=0
            ),  # max within-chunk row span (per-chunk-shift admission)
            "n_scan_raw": cmax - cmin + 2 * margin + 1,
            "rmin_sub": rmin_sub,
            "rmax_sub": rmax_sub,
            "cmin_sub": cmin_sub,
            "cmax_sub": cmax_sub,
        }
        if vpx is not None:
            parts["valid_px"] = vpx
        return scalars, jnp.logical_not(ok_sub), parts
    out = (scalars, jnp.logical_not(ok_sub))
    if rescue is not None:
        out = out + (rescue,)
    if split_pieces:
        # Deterministic arity like pixel_valid: requesting split always
        # appends the slot (None when statically unavailable, e.g. the
        # lane budget does not divide by the channel count).
        out = out + (split,)
    if pixel_valid:
        # Deterministic arity: pixel_valid=True always appends the slot,
        # None when no per-pixel model exists (ww2/whole-window bodies) —
        # callers distinguish fields by ndim, never by position guessing.
        out = out + (vpx,)
    return out


def _make_kernel(
    in_lens, out_lens, in_h, in_w, out_h, out_w, c_ch,
    interp, wrap, has_rotation, tile_rows, n_groups, rb: int = RB,
    scan_unroll: int = SCAN_UNROLL, cb: int = CB,
    h_pad: int = 0, wl: int = 0, gchunks: int = 0, compact: bool = False,
    ww2: bool = False, split: bool = False,
):
    n_taps = _interp_taps(interp)
    n_sub = tile_rows // 8  # 8-row sub-tiles sharing each column read
    SU = scan_unroll
    # Whole-window mode: one DMA fetches the tile's entire column window
    # (gchunks 128-lane gather vregs + 128 lanes of alignment slack).
    WW = (gchunks + 1) * 128 if gchunks else _w_win(scan_unroll, c_ch)
    GL = gchunks * 128
    HW = 2 * rb
    # Split-rescue slots: each compact slot computes BOTH 8x64 halves of
    # one bad sub-tile from two per-piece windows of HALF_L gather lanes
    # (+128 lanes of DMA alignment slack each).
    HALF_L = GL // 2
    WWP = HALF_L + 128

    def kernel(scalars_s, rot_ref, src_ref, out_ref, buf, sem):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        n_tx_g = pl.num_programs(1)
        r_base = scalars_s[ty, tx * SC + 1]
        c_start = scalars_s[ty, tx * SC + 2]
        n_scan = scalars_s[ty, tx * SC + 3]
        seam = scalars_s[ty, tx * SC + 4] > 0
        # Per-sub-tile roll shifts (slots 6..) and per-step drifts
        # (slots 6+n_sub..): shift_h(step) = shifts[h] + step * drifts[h].
        shifts = [scalars_s[ty, tx * SC + 6 + h] for h in range(n_sub)]
        drifts = [scalars_s[ty, tx * SC + 6 + n_sub + h] for h in range(n_sub)]

        # SCAN-WINDOW DMA. Each scan step's (2*rb, SU*C) source window is
        # DMA'd from the HBM-resident interleaved source into one of two
        # VMEM slots at dynamic offsets (Mosaic alignment rules: row base
        # multiple of 8, lane base/width multiple of 128 — the prepass
        # 8-quantizes the row base; the lane base rounds down to 128 and
        # a dynamic lane roll re-aligns the scan start). DMAs are issued
        # one step ahead, and the LAST step of each tile issues the NEXT
        # tile's first window (its scalars are in the prefetch array), so
        # the ~us DMA latency hides behind compute; slots alternate in
        # issue order with at most two DMAs in flight, so a slot's next
        # write never races its previous read (measured: serialized
        # per-tile DMA waits cost ~11 us/tile, pipelined ~1.5 us).
        def lane_base(cs, step):
            la = (cs + step * SU) * c_ch
            return jnp.clip((la // 128) * 128, 0, wl - WW), la

        def dma_for(tyy, txx, step, slot):
            rb_t = scalars_s[tyy, txx * SC + 1]
            cs_t = scalars_s[tyy, txx * SC + 2]
            r0 = pl.multiple_of(jnp.clip(rb_t, 0, h_pad - HW), 8)
            l0, _ = lane_base(cs_t, step)
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(r0, HW), pl.ds(pl.multiple_of(l0, 128), WW)],
                buf.at[slot],
                sem.at[slot],
            )

        def dma_split(tyy, p, slot):
            # Per-PIECE window fetch (split slots): piece 0's fields ride
            # the standard slots 1/2, piece 1's in 12/13 (compact grid is
            # (cap, 1), so tx is always 0 and the slot index is direct).
            rb_t = scalars_s[tyy, 12 if p else 1]
            cs_t = scalars_s[tyy, 13 if p else 2]
            r0 = pl.multiple_of(jnp.clip(rb_t, 0, h_pad - HW), 8)
            la = cs_t * c_ch
            l0 = jnp.clip((la // 128) * 128, 0, wl - WWP)
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(r0, HW), pl.ds(pl.multiple_of(l0, 128), WWP)],
                buf.at[slot, p],
                sem.at[slot, p],
            )

        @pl.when(jnp.logical_and(ty == 0, tx == 0))
        def _():
            if split:
                dma_split(0, 0, 0).start()
                dma_split(0, 1, 0).start()
            else:
                dma_for(0, 0, 0, 0).start()

        row0_k = rot_ref[0, 11].astype(jnp.int32)
        if compact:
            # Compacted rescue launch: each grid slot is ONE bad 8-row
            # sub-tile; its output position rides in scalar slots 5 (row)
            # and 8 (column) instead of deriving from (ty, tx).
            out_r0 = scalars_s[ty, tx * SC + 5]
            out_c0 = scalars_s[ty, tx * SC + 8]
        else:
            out_r0 = ty * tile_rows
            out_c0 = tx * TC
        rows = jnp.minimum(
            row0_k + out_r0
            + jax.lax.broadcasted_iota(jnp.int32, (tile_rows, TC), 0),
            out_h - 1,
        )
        cols = jnp.minimum(
            out_c0 + jax.lax.broadcasted_iota(jnp.int32, (tile_rows, TC), 1),
            out_w - 1,
        )
        # Sub-pixel supersample offsets ride in SMEM slots 9/10 so one
        # compiled kernel serves every stratified offset.
        cx = (cols.astype(jnp.float32) + jnp.float32(0.5)) - jnp.float32(
            out_w * 0.5
        ) + rot_ref[0, 9]
        cy = (rows.astype(jnp.float32) + jnp.float32(0.5)) - jnp.float32(
            out_h * 0.5
        ) + rot_ref[0, 10]

        rot = None
        if has_rotation:
            rot = jnp.stack(
                [
                    jnp.stack([rot_ref[0, 3 * i + j] for j in range(3)])
                    for i in range(3)
                ]
            )
        sx, sy = remap_ops.source_coords(
            in_lens, out_lens, in_h, in_w, cx, cy, rot, out_h, out_w, xp=kxp
        )
        xt = taps_mod.x_taps(sx, in_w, interp, wrap, xp=jnp)
        yt = taps_mod.y_taps(sy, in_h, interp, xp=jnp)

        seam_px = jnp.broadcast_to(seam, (tile_rows, TC))
        # Hoisted loop invariants: per-tap column keys relative to the scan
        # start (compared against the loop counter k) and window-relative
        # row-tap positions. Per-(tap, group) masks stay in-loop under the
        # group-range cond to keep live VMEM bounded at 4K scale.
        if split:
            # SPLIT slot: per-pixel window bases select by lane half.
            # Piece B's gather columns live HALF_L lanes up in the
            # concatenated window, folded in as HALF_L//c_ch texels so
            # the generic gather body below runs unchanged.
            isB = jax.lax.broadcasted_iota(
                jnp.int32, (tile_rows, TC), 1) >= (TC // 2)
            csB = scalars_s[ty, tx * SC + 13]
            rbB = scalars_s[ty, tx * SC + 12]
            shB = scalars_s[ty, tx * SC + 16]
            c_start_k = jnp.where(isB, csB - HALF_L // c_ch, c_start)
            r_base_k = jnp.where(isB, rbB, r_base)
            sh_split = jnp.where(
                isB,
                jnp.clip(shB, 0, HW - 1),
                jnp.clip(shifts[0], 0, HW - 1),
            )
        else:
            c_start_k, r_base_k = c_start, r_base
        x_key = [
            taps_mod.monotonize_x(i, in_w, seam_px, xp=jnp) + PAD - c_start_k
            for i in xt.idx
        ]
        # Row-tap positions relative to each sub-tile's rolled window start
        # (each sub-tile has its own roll shift, so its taps live in
        # [0, n_groups*8) — typically one group); hoisted per-(tap, group,
        # sub-tile) gather indices and masked row weights (loop-invariant).
        def half(a, h):
            return a[h * 8:(h + 1) * 8]

        # Row-tap positions relative to the block base, hoisted; the
        # per-step sheared shift is subtracted inside the scan loop.
        y_base = [
            [half(i + PAD - r_base_k, h) for h in range(n_sub)]
            for i in yt.idx
        ]
        if n_groups == 1:
            # One group per sub-tile: y_rel clips to [0, 8), making the
            # group-range mask vacuous — use the row weights directly.
            wrow_hoist = [[[half(yt.weights[m], h) for h in range(n_sub)]]
                          for m in range(n_taps)]
        else:
            wrow_hoist = None
        yw_h = [[half(yt.weights[m], h) for h in range(n_sub)] for m in range(n_taps)]
        x_key_h = [[half(x_key[m], h) for h in range(n_sub)] for m in range(n_taps)]
        xw_h = [[half(xt.weights[m], h) for h in range(n_sub)] for m in range(n_taps)]

        accs = [
            [jnp.zeros((8, TC), jnp.float32) for _ in range(n_sub)]
            for _ in range(c_ch)
        ]

        if gchunks:
            # ---- WHOLE-WINDOW BODY ----
            # One DMA per tile; texels reach output pixels by per-lane
            # dynamic gathers (take_along_axis on the lane dim — exact on
            # hardware for (S, 128) operands, hence the 128-lane chunking).
            # Work per sub-tile: ng*8 window rows x (1 broadcast +
            # C x taps x gchunks gathers) — independent of the scan width,
            # ~4x fewer vector ops than the scan body on smooth tiles.
            tlin = ty * n_tx_g + tx
            slot = jax.lax.rem(tlin, 2)
            if split:
                dma_split(ty, 0, slot).wait()
                dma_split(ty, 1, slot).wait()
            else:
                dma_for(ty, tx, 0, slot).wait()
            is_last = jnp.logical_and(
                ty == pl.num_programs(0) - 1, tx == n_tx_g - 1
            )

            @pl.when(jnp.logical_not(is_last))
            def _():
                nty = jnp.where(tx + 1 < n_tx_g, ty, ty + 1)
                ntx = jnp.where(tx + 1 < n_tx_g, tx + 1, 0)
                if split:
                    dma_split(nty, 0, 1 - slot).start()
                    dma_split(nty, 1, 1 - slot).start()
                else:
                    dma_for(nty, ntx, 0, 1 - slot).start()

            if split:
                # Assemble the two per-piece windows: lane-align each
                # fetched half (dynamic positive roll, Mosaic-safe),
                # apply its OWN vertical shift, and concatenate — the
                # generic gather body then sees one (HW, GL) window
                # whose lane halves belong to different source windows.
                halves = []
                for p, (cs_p, sh_p) in enumerate(
                        ((c_start, shifts[0]), (csB, shB))):
                    la_p = cs_p * c_ch
                    l0_p = jnp.clip((la_p // 128) * 128, 0, wl - WWP)
                    mis_p = jnp.clip(la_p - l0_p, 0, WWP - 1)
                    w_p = pltpu.roll(buf[slot, p], WWP - mis_p, 1)[:, :HALF_L]
                    w_p = pltpu.roll(w_p, HW - jnp.clip(sh_p, 0, HW - 1), 0)
                    halves.append(w_p)
                wfull = jnp.concatenate(halves, axis=1)
            else:
                l0, la = lane_base(c_start, 0)
                mis = jnp.clip(la - l0, 0, WW - 1)
                wfull = pltpu.roll(buf[slot], WW - mis, 1)[:, :GL]
            if ww2:
                # ---- TWO-STEP-GATHER BODY (ops/pallas/ww2.py) ----
                # One lane gather per (tap offset, channel) over the
                # whole window + one sublane gather per y-tap, with the
                # per-pixel +-1 drift select; prepass-admitted only
                # where consecutive-tap / spread<=1 exactness holds.
                for h in range(n_sub):
                    sh_h = jnp.clip(shifts[h], 0, HW - 1)
                    rolled_h = pltpu.roll(wfull, HW - sh_h, 0)
                    y_rel = [
                        jnp.clip(y_base[m][h] - sh_h, 0, n_groups * 8 - 1)
                        for m in range(n_taps)
                    ]
                    new_acc = ww2_mod.ww2_subtile(
                        rolled_h[:n_groups * 8, :],
                        x_key_h[0][h],
                        y_rel,
                        [xw_h[m][h] for m in range(n_taps)],
                        [yw_h[m][h] for m in range(n_taps)],
                        [accs[c][h] for c in range(c_ch)],
                        c_ch=c_ch, n_taps=n_taps, gchunks=gchunks,
                        rows_w=n_groups * 8,
                    )
                    for c in range(c_ch):
                        accs[c][h] = new_acc[c]
                for c in range(c_ch):
                    for h in range(n_sub):
                        out_ref[c, h * 8:(h + 1) * 8, :] = accs[c][h]
                return
            for h in range(n_sub):
                if split:
                    # Vertical shifts already applied per piece above;
                    # the per-pixel shift drives only the tap positions.
                    rolled_h = wfull
                    y_rel = [
                        jnp.clip(y_base[m][h] - sh_split, 0,
                                 n_groups * 8 - 1)
                        for m in range(n_taps)
                    ]
                else:
                    sh_h = jnp.clip(shifts[h], 0, HW - 1)
                    rolled_h = pltpu.roll(wfull, HW - sh_h, 0)
                    y_rel = [
                        jnp.clip(y_base[m][h] - sh_h, 0, n_groups * 8 - 1)
                        for m in range(n_taps)
                    ]
                xli = [x_key_h[m][h] * c_ch for m in range(n_taps)]
                for j in range(n_groups * 8):
                    mj = sum(
                        jnp.where(y_rel[m] == j, yw_h[m][h], 0.0)
                        for m in range(n_taps)
                    )
                    row = rolled_h[j:j + 1, :]
                    opgs = [
                        jnp.broadcast_to(row[:, q * 128:(q + 1) * 128], (8, 128))
                        for q in range(gchunks)
                    ]
                    for c in range(c_ch):
                        sx_j = None
                        for m in range(n_taps):
                            idx = xli[m] + c
                            g = jnp.take_along_axis(
                                opgs[0], jnp.clip(idx, 0, 127), axis=1
                            )
                            for q in range(1, gchunks):
                                gq = jnp.take_along_axis(
                                    opgs[q],
                                    jnp.clip(idx - q * 128, 0, 127),
                                    axis=1,
                                )
                                g = jnp.where(idx >= q * 128, gq, g)
                            term = g * xw_h[m][h]
                            sx_j = term if sx_j is None else sx_j + term
                        accs[c][h] = accs[c][h] + sx_j * mj
            for c in range(c_ch):
                for h in range(n_sub):
                    out_ref[c, h * 8:(h + 1) * 8, :] = accs[c][h]
            return

        n_steps = n_scan // SU

        def body(i, accs):
            out = accs
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_steps)
            def _():
                dma_for(ty, tx, i + 1, jax.lax.rem(i + 1, 2)).start()

            dma_for(ty, tx, i, slot).wait()
            # Re-align the fetched window: lane m of the scan window (m =
            # misalignment of the 128-rounded fetch base) moves to lane 0.
            # NOTE: dynamic NEGATIVE roll shifts are miscompiled on real
            # TPUs (correct in interpret mode); use the positive
            # equivalent.
            l0, la = lane_base(c_start, i)
            m = jnp.clip(la - l0, 0, WW - 1)
            coltT = pltpu.roll(buf[slot], WW - m, 1)[:, : SU * c_ch]
            # One roll per sub-tile aligns that sub-tile's SHEARED window
            # start (shift + step*drift) to sublane 0, so each sub-tile
            # needs only n_groups (usually 1) gathers per tap even when the
            # mapping is steep but locally linear (polar arcs).
            sh = [
                jnp.clip(shifts[h] + i * drifts[h], 0, 2 * rb - 1)
                for h in range(n_sub)
            ]
            rolledT = [pltpu.roll(coltT, 2 * rb - sh[h], 0) for h in range(n_sub)]
            y_rel = [
                [
                    jnp.clip(y_base[m][h] - sh[h], 0, n_groups * 8 - 1)
                    for h in range(n_sub)
                ]
                for m in range(n_taps)
            ]
            loc = [
                [
                    [jnp.clip(y_rel[m][h] - g * 8, 0, 7) for h in range(n_sub)]
                    for g in range(n_groups)
                ]
                for m in range(n_taps)
            ]
            if wrow_hoist is not None:
                wrow = wrow_hoist
            else:
                wrow = [
                    [
                        [
                            jnp.where(
                                jnp.logical_and(
                                    y_rel[m][h] >= g * 8,
                                    y_rel[m][h] < (g + 1) * 8,
                                ),
                                yw_h[m][h],
                                0.0,
                            )
                            for h in range(n_sub)
                        ]
                        for g in range(n_groups)
                    ]
                    for m in range(n_taps)
                ]
            for u in range(SU):
                k = i * SU + u
                colw = [
                    sum(
                        jnp.where(x_key_h[m][h] == k, xw_h[m][h], 0.0)
                        for m in range(n_taps)
                    )
                    for h in range(n_sub)
                ]
                nxt = []
                for c in range(c_ch):
                    acc_c = []
                    for h in range(n_sub):
                        rolled = rolledT[h][:, u * c_ch + c:u * c_ch + c + 1]
                        rowv = jnp.zeros((8, TC), jnp.float32)
                        for g in range(n_groups):
                            opg = jnp.broadcast_to(rolled[g * 8:(g + 1) * 8], (8, TC))
                            for m in range(n_taps):
                                gl = jnp.take_along_axis(opg, loc[m][g][h], axis=0)
                                rowv = rowv + gl * wrow[m][g][h]
                        acc_c.append(out[c][h] + rowv * colw[h])
                    nxt.append(acc_c)
                out = nxt
            return out

        accs = jax.lax.fori_loop(0, n_steps, body, accs)
        # Prefetch the NEXT tile's first scan window (slot 0 was last
        # consumed two issues ago, so the write cannot race a live read).
        is_last = jnp.logical_and(
            ty == pl.num_programs(0) - 1, tx == n_tx_g - 1
        )

        @pl.when(jnp.logical_not(is_last))
        def _():
            nty = jnp.where(tx + 1 < n_tx_g, ty, ty + 1)
            ntx = jnp.where(tx + 1 < n_tx_g, tx + 1, 0)
            dma_for(nty, ntx, 0, 0).start()

        for c in range(c_ch):
            for h in range(n_sub):
                out_ref[c, h * 8:(h + 1) * 8, :] = accs[c][h]

    return kernel


def _remap_pallas_one(
    src: Array,
    rotation: Optional[Array],
    *,
    in_lens: LensSpec,
    out_lens: LensSpec,
    out_h: int,
    out_w: int,
    interp: str,
    off_x: float,
    off_y: float,
    tile_rows: int = TR,
    n_groups: int = 0,
    rb: int = RB,
    scan_unroll: int = 0,
    cb: int = 0,
    shared=None,
    row0=0,
    band_rows: int = 0,
    rescue_cap: int = 0,
    rescue_budgets=None,
    valid_px: Optional[Array] = None,
    split_cap: int = 0,
) -> Tuple[Array, Array]:
    """One subsample launch. Returns (out (band_rows, out_w, C), ok flag).

    ``row0``/``band_rows``: compute only output rows
    [row0, row0 + band_rows) — the unit of multi-chip spatial sharding
    (band_rows=0 means the full image). row0 may be traced
    (jax.lax.axis_index under shard_map).

    ``shared``: optional (padded, scalars, bad[, rescue]) from a previous
    subsample of the same run (the prepass unions tap windows over the
    extreme stratified offsets; the block stack is offset-independent).

    ``rescue_cap`` > 0 (static) enables the pass-2 rescue: up to that
    many bad sub-tiles whose OWN whole-window fits the rescue budgets
    are recomputed exactly by a compact whole-window launch instead of
    the ~30 ns/px XLA patch. Size it from the plan's rescuable count
    (see make_prepass(with_rescue=True)).

    ``valid_px`` ((n_ty*tile_rows, n_tx*TC) bool, from
    make_prepass(pixel_valid=True)): switches the patch to PIXEL
    granularity — only bad-sub-tile pixels the kernel did NOT compute
    exactly are resampled, instead of whole 8x128 blocks. Scan-body
    launches only (whole-window/ww2 launches ignore it).

    ``split_cap`` > 0 (static) enables the pass-2b SPLIT rescue: up to
    that many still-patched sub-tiles BOTH of whose 8x64 halves fit
    per-piece windows under HALF the (ng, g) lane budget are recomputed
    by a second compact launch (two per-piece window DMAs per slot).
    Serves cluster-jump windows (seam monotonization, polar-arc
    reversals) that no contiguous whole-sub-tile window can cover.
    """
    if n_groups <= 0:
        n_groups = _active_groups(tile_rows)
    n_groups = min(n_groups, _max_groups(rb))
    in_h, in_w = int(src.shape[0]), int(src.shape[1])
    c_ch = int(src.shape[2])
    scan_unroll, gchunks, ww2 = _resolve_su(scan_unroll, c_ch)
    if cb <= 0:
        cb = CB
    wrap = wrap_mode_for_input(in_lens)

    if band_rows <= 0:
        band_rows = out_h
    n_ty = -(-band_rows // tile_rows)
    n_tx = -(-out_w // TC)

    r_ng, r_g = rescue_budgets if rescue_budgets else (RESCUE_NG, RESCUE_G)
    r_rb = _rescue_rb(r_ng)
    rescue = None
    if shared is None:
        padded, h_pad, w_pad = _pad_source(src, wrap, rb, cb)
        n_rp = h_pad // rb - 1
        n_cp = w_pad // cb - 1
        pre = _prepass(
            in_lens, out_lens, in_h, in_w, out_h, out_w,
            rotation, ((off_x, off_y),), interp, wrap, n_ty, n_tx, n_rp, n_cp,
            tile_rows, n_groups, row0=row0, rb=rb, scan_unroll=scan_unroll,
            cb=cb, max_chunks=1 if gchunks else 0, ww2=ww2,
            rescue_channels=c_ch if rescue_cap > 0 else 0,
            rescue_budgets=(r_ng, r_g),
            split_pieces=2 if split_cap > 0 else 0,
        )
        scalars, bad = pre[:2]
        rescue = pre[2] if len(pre) > 2 else None
        split_f = pre[3] if len(pre) > 3 else None
    elif len(shared) > 3:
        padded, scalars, bad, rescue = shared[:4]
        split_f = shared[4] if len(shared) > 4 else None
    else:
        padded, scalars, bad = shared
        split_f = None
    # Rescue feasibility is static: the pass-2 DMA window must fit the
    # padded source, and the cap must be sized (> 0) by the caller.
    if (
        rescue is None
        or rescue_cap <= 0
        or int(padded.shape[0]) < 2 * r_rb
        or int(padded.shape[1]) < (r_g + 1) * 128
    ):
        rescue = None
        rescue_cap = 0
    # The split rescue shares the (ng, g) budgets and rides only on an
    # enabled rescue pass (its per-piece fields exist only then); its
    # per-piece fetch width r_g*64+128 is within the rescue's check.
    if split_f is None or split_cap <= 0 or rescue is None \
            or not split_feasible(r_g, c_ch, _interp_taps(interp)):
        split_f = None
        split_cap = 0
    n_bad = jnp.sum(bad.astype(jnp.int32))
    # Hybrid threshold: the patch samples bad SUB-TILES (8-row units —
    # overflow is tracked per sub-tile, so one folding sub-tile no longer
    # forces a whole-tile resample) VECTORIZED in fixed chunks (cost
    # scales with the actual bad count, one compiled chunk graph), so
    # patching a fraction f of the frame costs ~f * full-XLA — break-even
    # vs the full XLA path sits near f ~ 0.9 (the kernel's share is
    # cheap). Cap at 60%: beyond that, measured configs are degenerate
    # everywhere and full XLA avoids the kernel+patch overhead.
    n_sub = tile_rows // 8
    n_units = n_ty * n_sub * n_tx
    patch_chunk = max(1, n_units // 32)
    max_bad = max(1, int(n_units * 0.60))
    n_chunks_cap = -(-max_bad // patch_chunk)
    cap_padded = n_chunks_cap * patch_chunk
    if scan_unroll < 0 or gchunks:
        # whole-window / ww2 bodies: the per-pixel exactness model is
        # scan-body-only; fall back to sub-tile patching.
        valid_px = None
    if rescue is not None:
        taken = _rescue_taken(bad, rescue, rescue_cap)
        patch_mask = jnp.logical_and(bad, jnp.logical_not(taken))
        n_bad = jnp.sum(patch_mask.astype(jnp.int32))  # XLA-patched units
        r_ty, r_h, r_tx = jnp.nonzero(taken, size=rescue_cap, fill_value=-1)
    else:
        patch_mask = bad
    if split_f is not None:
        # Pass-2b SPLIT set: still-patched sub-tiles BOTH of whose 8x64
        # halves fit per-piece windows, capped in row-major order like
        # the whole-rescue set.
        split_ok_sub = jnp.logical_and(
            patch_mask, jnp.all(split_f[3] > 0, axis=3)
        )
        flat_s = split_ok_sub.reshape(-1)
        taken_s = jnp.logical_and(
            flat_s, jnp.cumsum(flat_s.astype(jnp.int32)) <= split_cap
        ).reshape(split_ok_sub.shape)
        patch_mask = jnp.logical_and(patch_mask, jnp.logical_not(taken_s))
        n_bad = jnp.sum(patch_mask.astype(jnp.int32))
        s_ty, s_h, s_tx = jnp.nonzero(taken_s, size=split_cap, fill_value=-1)
    if valid_px is None:
        bad_ty, bad_h, bad_tx = jnp.nonzero(
            patch_mask, size=cap_padded, fill_value=-1)
        # Rewrite fill slots as ascending out-of-grid tile rows (same
        # scheme as the pixel list below): nonzero's row-major order
        # makes the real (8, TC) block starts lexicographically sorted
        # and non-overlapping, so the chunk scatter can claim sorted +
        # unique instead of XLA's serializing collision-safe lowering.
        t_slot = jnp.arange(bad_ty.shape[0], dtype=jnp.int32)
        t_fill = bad_ty < 0
        bad_ty = jnp.where(t_fill, n_ty + t_slot, bad_ty)
        bad_h = jnp.where(t_fill, 0, bad_h)
        bad_tx = jnp.where(t_fill, 0, bad_tx)
    else:
        # PIXEL-granular patch set: bad-sub-tile pixels the kernel did
        # not compute exactly (the per-pixel prepass refinement).
        n_px = n_ty * tile_rows * n_tx * TC
        px_chunk, max_bad_px, cap_padded_px = _px_patch_sizes(n_px)
        if valid_px.dtype == jnp.bool_:
            # Inline mask: compact per launch (pixel_patch=True without
            # a plan). Frame streams should pass compact_valid_px's
            # precompacted list instead — the mask + nonzero below are
            # config-only and identical every frame.
            bad_px_mask = jnp.logical_and(
                jnp.repeat(
                    jnp.repeat(patch_mask, 8, axis=1).reshape(
                        n_ty * tile_rows, n_tx),
                    TC, axis=1,
                ),
                jnp.logical_not(valid_px),
            )
            bad_iy, bad_ix = jnp.nonzero(
                bad_px_mask, size=cap_padded_px, fill_value=-1)
            n_bad_px = jnp.sum(bad_px_mask.astype(jnp.int32))
        else:
            # Precompacted (2, cap_padded_px) int32 from compact_valid_px
            # (plan-time, config-only). A full list (no -1 fill) means
            # the true count may exceed the cap — the count then reads
            # as cap_padded_px (> max_bad_px), which correctly fails the
            # pallas-branch gate below and takes the full XLA path.
            if valid_px.shape != (2, cap_padded_px):
                raise ValueError(
                    f"precompacted valid_px shape {valid_px.shape} does "
                    f"not match this launch's (2, {cap_padded_px}) — was "
                    "the plan built for a different tiling/band?"
                )
            bad_iy, bad_ix = valid_px[0], valid_px[1]
            n_bad_px = jnp.sum((bad_iy >= 0).astype(jnp.int32))
        # Rewrite the -1 fill slots as ASCENDING out-of-grid rows: the
        # real entries come from jnp.nonzero (row-major, so already
        # lexicographically sorted and unique) and the rewritten fills
        # extend that order past the last real row, which lets the
        # per-pixel scatter below claim indices_are_sorted +
        # unique_indices (XLA otherwise assumes collisions and lowers a
        # serializing combine — the dominant share of the measured
        # 113 ns/px, see _PX_PATCH_NS_PER_PX). FILL_OR_DROP still
        # discards them: h_grid + slot >= the planar row count.
        h_grid = n_ty * tile_rows
        fill_slot = jnp.arange(bad_iy.shape[0], dtype=jnp.int32)
        px_fill = bad_iy < 0
        bad_iy = jnp.where(px_fill, h_grid + fill_slot, bad_iy)
        bad_ix = jnp.where(px_fill, 0, bad_ix)

    # The kernel ALWAYS applies a rotation: identity when none was given
    # (bitwise-identical results — multiplying by exact identity is exact
    # in f32, and the reference itself always multiplies, src/main.cpp:323).
    # This also dodges a backend-compiler SIGABRT that hits multi-sub-tile
    # kernels whose SMEM rotation operand is unused (rotation=None).
    has_rotation = True
    rot_for_kernel = (
        rotation if rotation is not None else jnp.eye(3, dtype=jnp.float32)
    )
    rot_arr = jnp.zeros((1, 16), jnp.float32)
    rot_arr = rot_arr.at[0, :9].set(rot_for_kernel.reshape(9).astype(jnp.float32))
    rot_arr = rot_arr.at[0, 9].set(jnp.float32(off_x))
    rot_arr = rot_arr.at[0, 10].set(jnp.float32(off_y))
    rot_arr = rot_arr.at[0, 11].set(jnp.asarray(row0, jnp.float32))

    kernel = _make_kernel(
        in_lens, out_lens, in_h, in_w, out_h, out_w, c_ch,
        interp, wrap, has_rotation, tile_rows, n_groups, rb=rb,
        scan_unroll=scan_unroll, cb=cb,
        h_pad=int(padded.shape[0]), wl=int(padded.shape[1]), gchunks=gchunks,
        ww2=ww2,
    )

    def pallas_branch(operands):
        padded_, rot_, src_ = operands
        # The interleaved padded source stays in HBM (memory_space ANY);
        # the kernel DMAs each tile's scan windows from it directly (see
        # _make_kernel). This replaces the former 2x2 (CB, rb) page grid
        # of BlockSpec fetches: no per-frame page transpose, no 4x window
        # overfetch, and no page-fit admission constraints — the scan
        # start is exact and the row base quantizes to 8 rows.
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_ty, n_tx),
            in_specs=[
                pl.BlockSpec((1, 16), lambda ty, tx, *_: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (c_ch, tile_rows, TC),
                lambda ty, tx, *_: (0, ty, tx),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM(
                    (
                        2, 2 * rb,
                        (gchunks + 1) * 128 if gchunks
                        else _w_win(scan_unroll, c_ch),
                    ),
                    jnp.float32,
                ),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out_planar = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (c_ch, n_ty * tile_rows, n_tx * TC), jnp.float32
            ),
            grid_spec=grid_spec,
            interpret=_INTERPRET,
        )(scalars, rot_, padded_)

        if rescue is not None:
            # PASS-2 RESCUE: recompute the capped rescuable sub-tiles with
            # a COMPACT whole-window launch (one grid slot per bad 8-row
            # sub-tile, per-slot OWN windows from the rescue prepass) —
            # exact like the main kernel, ~7x cheaper than the XLA patch.
            rc = jnp.maximum(r_ty, 0)
            rh = jnp.maximum(r_h, 0)
            rx = jnp.maximum(r_tx, 0)

            def g3(a):
                return a[rc, rh, rx].astype(jnp.int32)

            seam_tile = scalars.reshape(n_ty, n_tx, SC)[..., 4]
            zero_s = jnp.zeros((rescue_cap,), jnp.int32)
            fields2 = [
                zero_s,
                g3(rescue[0]),            # slot 1: DMA row base
                g3(rescue[1]),            # slot 2: scan start column
                zero_s,                   # slot 3: n_scan (unused by WW)
                seam_tile[rc, rx].astype(jnp.int32),  # slot 4: seam
                (rc * tile_rows + rh * 8).astype(jnp.int32),  # slot 5: out row
                g3(rescue[2]),            # slot 6: window shift
                zero_s,                   # slot 7: drift (unused)
                (rx * TC).astype(jnp.int32),          # slot 8: out col
            ]
            fields2 += [zero_s] * (SC - len(fields2))
            scalars2 = jnp.stack(fields2, axis=-1)  # (cap, SC)

            kernel2 = _make_kernel(
                in_lens, out_lens, in_h, in_w, out_h, out_w, c_ch,
                interp, wrap, has_rotation, 8, r_ng, rb=r_rb,
                scan_unroll=(r_g * 128) // c_ch, cb=cb,
                h_pad=int(padded.shape[0]), wl=int(padded.shape[1]),
                gchunks=r_g, compact=True,
            )
            grid_spec2 = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(rescue_cap, 1),
                in_specs=[
                    pl.BlockSpec((1, 16), lambda ty, tx, *_: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (c_ch, 8, TC),
                    lambda ty, tx, *_: (0, ty, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM(
                        (2, 2 * r_rb, (r_g + 1) * 128), jnp.float32
                    ),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            out2 = pl.pallas_call(
                kernel2,
                out_shape=jax.ShapeDtypeStruct(
                    (c_ch, rescue_cap * 8, TC), jnp.float32
                ),
                grid_spec=grid_spec2,
                interpret=_INTERPRET,
            )(scalars2, rot_, padded_)
            updates2 = jnp.transpose(
                out2.reshape(c_ch, rescue_cap, 8, TC), (1, 0, 2, 3)
            )
            # The rescued-slot starts come from row-major nonzero order
            # (sorted, non-overlapping sub-tile windows); rewrite the -1
            # fill slots as ascending out-of-grid rows so the scatter
            # can claim sorted + unique — a collision-safe scatter of
            # ~1k block updates serializes and was a prime suspect in
            # the fitted 2.8 ms per-launch rescue overhead.
            r_slot = jnp.arange(rescue_cap, dtype=jnp.int32)
            r_fill = r_ty < 0
            r_ty_s = jnp.where(r_fill, n_ty + r_slot, r_ty)
            r_h_s = jnp.where(r_fill, 0, r_h)
            r_tx_s = jnp.where(r_fill, 0, r_tx)
            starts2 = jnp.stack(
                [r_ty_s * tile_rows + r_h_s * 8, r_tx_s * TC], axis=-1
            )
            out_planar = jax.lax.scatter(
                out_planar,
                starts2,
                updates2,
                jax.lax.ScatterDimensionNumbers(
                    update_window_dims=(1, 2, 3),
                    inserted_window_dims=(),
                    scatter_dims_to_operand_dims=(1, 2),
                ),
                indices_are_sorted=True,
                unique_indices=True,
                mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
            )

        if split_f is not None:
            # PASS-2B SPLIT RESCUE: recompute still-patched sub-tiles
            # whose HALVES both fit per-piece windows (cluster-jump
            # windows no contiguous whole-window covers — measured 60.6%
            # of cfg2's patched set, bench/overflow_split_probe.py).
            # Same compact whole-window body; each slot DMAs TWO
            # per-piece windows and the per-pixel bases select by lane
            # half (see _make_kernel split=True).
            sc3 = jnp.maximum(s_ty, 0)
            sh3 = jnp.maximum(s_h, 0)
            sx3 = jnp.maximum(s_tx, 0)

            def g3s(a, piece):
                return a[sc3, sh3, sx3, piece].astype(jnp.int32)

            seam_tile3 = scalars.reshape(n_ty, n_tx, SC)[..., 4]
            zero_s3 = jnp.zeros((split_cap,), jnp.int32)
            fields3 = [
                zero_s3,
                g3s(split_f[0], 0),           # 1: piece-A DMA row base
                g3s(split_f[1], 0),           # 2: piece-A window col start
                zero_s3,                      # 3: n_scan (unused by WW)
                seam_tile3[sc3, sx3].astype(jnp.int32),  # 4: seam
                (sc3 * tile_rows + sh3 * 8).astype(jnp.int32),  # 5: out row
                g3s(split_f[2], 0),           # 6: piece-A shift
                zero_s3,                      # 7: drift (unused)
                (sx3 * TC).astype(jnp.int32),  # 8: out col
                zero_s3,
                zero_s3,
                zero_s3,
                g3s(split_f[0], 1),           # 12: piece-B DMA row base
                g3s(split_f[1], 1),           # 13: piece-B window col start
                zero_s3,
                zero_s3,
                g3s(split_f[2], 1),           # 16: piece-B shift
            ]
            fields3 += [zero_s3] * (SC - len(fields3))
            scalars3 = jnp.stack(fields3, axis=-1)  # (split_cap, SC)

            kernel3 = _make_kernel(
                in_lens, out_lens, in_h, in_w, out_h, out_w, c_ch,
                interp, wrap, has_rotation, 8, r_ng, rb=r_rb,
                scan_unroll=(r_g * 128) // c_ch, cb=cb,
                h_pad=int(padded.shape[0]), wl=int(padded.shape[1]),
                gchunks=r_g, compact=True, split=True,
            )
            grid_spec3 = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(split_cap, 1),
                in_specs=[
                    pl.BlockSpec((1, 16), lambda ty, tx, *_: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (c_ch, 8, TC),
                    lambda ty, tx, *_: (0, ty, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM(
                        (2, 2, 2 * r_rb, r_g * 64 + 128), jnp.float32
                    ),
                    pltpu.SemaphoreType.DMA((2, 2)),
                ],
            )
            out3 = pl.pallas_call(
                kernel3,
                out_shape=jax.ShapeDtypeStruct(
                    (c_ch, split_cap * 8, TC), jnp.float32
                ),
                grid_spec=grid_spec3,
                interpret=_INTERPRET,
            )(scalars3, rot_, padded_)
            updates3 = jnp.transpose(
                out3.reshape(c_ch, split_cap, 8, TC), (1, 0, 2, 3)
            )
            s_slot = jnp.arange(split_cap, dtype=jnp.int32)
            s_fill = s_ty < 0
            s_ty_s = jnp.where(s_fill, n_ty + s_slot, s_ty)
            s_h_s = jnp.where(s_fill, 0, s_h)
            s_tx_s = jnp.where(s_fill, 0, s_tx)
            starts3 = jnp.stack(
                [s_ty_s * tile_rows + s_h_s * 8, s_tx_s * TC], axis=-1
            )
            out_planar = jax.lax.scatter(
                out_planar,
                starts3,
                updates3,
                jax.lax.ScatterDimensionNumbers(
                    update_window_dims=(1, 2, 3),
                    inserted_window_dims=(),
                    scatter_dims_to_operand_dims=(1, 2),
                ),
                indices_are_sorted=True,
                unique_indices=True,
                mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
            )

        # Patch overflow tiles with exact XLA-sampled values. Sampling is
        # VECTORIZED in fixed-size chunks over the bad-tile list (a
        # sequential per-tile sample measured ~0.6 ms/tile, throttling
        # fisheye<->equirect configs with hundreds of patched tiles to
        # ~25 Mpix/s); cost scales with the actual bad count in steps of
        # patch_chunk tiles, and zero-bad frames run zero chunk iterations.
        src_back = src_
        rot_mat = rotation if has_rotation else None
        wrap_mode = wrap_mode_for_input(in_lens)
        from .. import sampling as sampling_mod

        if valid_px is not None:
            # PIXEL-granular patch: resample only the truly-invalid
            # pixels (bad-sub-tile pixels failing the per-pixel
            # exactness refinement), chunked so cost scales with the
            # actual count. Fill slots (-1) clamp to pixel 0 for the
            # sampling math and scatter out of bounds (FILL_OR_DROP).
            def sample_chunk_px(c, planar):
                base = c * px_chunk
                iy_raw = jax.lax.dynamic_slice(bad_iy, (base,), (px_chunk,))
                ix_raw = jax.lax.dynamic_slice(bad_ix, (base,), (px_chunk,))
                # Fill slots were rewritten to ascending out-of-grid rows
                # above; clamp them into range for the sampling math only
                # (their scatter drops, FILL_OR_DROP).
                gy = jnp.minimum(row0 + jnp.maximum(iy_raw, 0), out_h - 1)
                ix = jnp.minimum(jnp.maximum(ix_raw, 0), out_w - 1)
                cx = (ix.astype(jnp.float32) + jnp.float32(0.5)
                      ) - jnp.float32(out_w * 0.5) + jnp.float32(off_x)
                cy = (gy.astype(jnp.float32) + jnp.float32(0.5)
                      ) - jnp.float32(out_h * 0.5) + jnp.float32(off_y)
                sx, sy = remap_ops.source_coords(
                    in_lens, out_lens, in_h, in_w, cx, cy, rot_mat,
                    out_h, out_w, xp=jnp,
                )
                vals = sampling_mod.sample(
                    src_back, sx, sy, interp, wrap_mode)  # (K, C)
                idx = jnp.stack([iy_raw, ix_raw], axis=-1)
                # Each chunk is a contiguous slice of the row-major
                # nonzero list with ascending-unique fills, so the
                # indices are lexicographically sorted and collision-free
                # — declare it: a False unique_indices makes XLA lower a
                # serializing combine per index.
                return jax.lax.scatter(
                    planar,
                    idx,
                    jnp.transpose(vals, (1, 0)),  # (C, K)
                    jax.lax.ScatterDimensionNumbers(
                        update_window_dims=(0,),
                        inserted_window_dims=(1, 2),
                        scatter_dims_to_operand_dims=(1, 2),
                    ),
                    indices_are_sorted=True,
                    unique_indices=True,
                    mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
                )

            n_patch_px = jnp.minimum(n_bad_px, max_bad_px)
            out_planar = jax.lax.fori_loop(
                0, -(-n_patch_px // px_chunk), sample_chunk_px, out_planar
            )
            return jnp.transpose(
                out_planar[:, :band_rows, :out_w], (1, 2, 0))

        def sample_chunk(c, planar):
            base = c * patch_chunk
            ty_raw = jax.lax.dynamic_slice(bad_ty, (base,), (patch_chunk,))
            hh_raw = jax.lax.dynamic_slice(bad_h, (base,), (patch_chunk,))
            tx_raw = jax.lax.dynamic_slice(bad_tx, (base,), (patch_chunk,))
            # Fill slots (rewritten to ascending out-of-grid tile rows)
            # sample clamped coordinates but scatter out of bounds, so
            # FILL_OR_DROP discards them.
            ty = jnp.maximum(ty_raw, 0)
            hh = jnp.maximum(hh_raw, 0)
            tx = jnp.maximum(tx_raw, 0)
            rows = jnp.minimum(
                row0 + (ty * tile_rows + hh * 8)[:, None, None]
                + jax.lax.broadcasted_iota(jnp.int32, (1, 8, TC), 1),
                out_h - 1,
            )
            cols = jnp.minimum(
                tx[:, None, None] * TC
                + jax.lax.broadcasted_iota(jnp.int32, (1, 8, TC), 2),
                out_w - 1,
            )
            cx = (cols.astype(jnp.float32) + jnp.float32(0.5)) - jnp.float32(
                out_w * 0.5
            ) + jnp.float32(off_x)
            cy = (rows.astype(jnp.float32) + jnp.float32(0.5)) - jnp.float32(
                out_h * 0.5
            ) + jnp.float32(off_y)
            sx, sy = remap_ops.source_coords(
                in_lens, out_lens, in_h, in_w, cx, cy, rot_mat,
                out_h, out_w, xp=jnp,
            )
            vals = sampling_mod.sample(src_back, sx, sy, interp, wrap_mode)
            patches = jnp.transpose(vals, (0, 3, 1, 2))  # (K, C, 8, TC)
            # Scatter this chunk's (8, TC) blocks in ONE vectorized write
            # (the former per-unit fori of dynamic_update_slice cost ~us
            # per bad unit — thousands of iterations at sub-tile
            # granularity). Chunked inside the dynamic fori, the scatter
            # cost scales with the ACTUAL bad count, not the 60% cap.
            starts = jnp.stack(
                [ty_raw * tile_rows + hh_raw * 8, tx_raw * TC], axis=-1
            )
            # Sorted + unique: row-major nonzero order, non-overlapping
            # (8, TC) windows, ascending-unique rewritten fills.
            return jax.lax.scatter(
                planar,
                starts,
                patches,
                jax.lax.ScatterDimensionNumbers(
                    update_window_dims=(1, 2, 3),
                    inserted_window_dims=(),
                    scatter_dims_to_operand_dims=(1, 2),
                ),
                indices_are_sorted=True,
                unique_indices=True,
                mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
            )

        n_patch = jnp.minimum(n_bad, max_bad)
        out_planar = jax.lax.fori_loop(
            0, -(-n_patch // patch_chunk), sample_chunk, out_planar
        )
        return jnp.transpose(out_planar[:, :band_rows, :out_w], (1, 2, 0))

    def xla_branch(operands):
        padded_, rot_, src_ = operands
        src_back = src_
        return _xla_subsample(
            src_back, rotation if has_rotation else None,
            in_lens, out_lens, out_h, out_w, interp, off_x, off_y,
            row0=row0, band_rows=band_rows,
        )

    # The original (H, W, C) source rides along for the patch/fallback
    # samplers: slicing it back out of the interleaved padded array kept
    # the slice+reshape fused into every patch gather (measured ~3x the
    # normal XLA-sampling cost on patch-heavy fisheye configs).
    # Pixel-granular launches gate on the PIXEL count: a frame can be
    # >60% bad sub-tiles yet mostly kernel-exact per pixel, and the
    # pixel patch only pays for the truly-invalid pixels.
    ok_kernel = (
        n_bad <= max_bad if valid_px is None else n_bad_px <= max_bad_px
    )
    result = jax.lax.cond(
        ok_kernel, pallas_branch, xla_branch, (padded, rot_arr, src)
    )
    return result, n_bad == 0


def _xla_subsample(src, rotation, in_lens, out_lens, out_h, out_w, interp,
                   off_x, off_y, row0=0, band_rows: int = 0):
    """Pure-XLA single-subsample remap at the given sub-pixel offset."""
    from .. import sampling

    if band_rows <= 0:
        band_rows = out_h
    in_h, in_w = int(src.shape[0]), int(src.shape[1])
    wrap = wrap_mode_for_input(in_lens)
    cx = (jnp.arange(out_w, dtype=jnp.float32) + jnp.float32(0.5)) - jnp.float32(
        out_w * 0.5
    ) + jnp.float32(off_x)
    cy = (
        (row0 + jnp.arange(band_rows, dtype=jnp.float32)) + jnp.float32(0.5)
    ) - jnp.float32(out_h * 0.5) + jnp.float32(off_y)
    sx, sy = remap_ops.source_coords(
        in_lens, out_lens, in_h, in_w, cx[None, :], cy[:, None],
        rotation, out_h, out_w, xp=jnp,
    )
    return sampling.sample(src, sx, sy, interp, wrap, xp=jnp)


def make_prepass(
    rotation: Optional[Array],
    *,
    in_lens: LensSpec,
    out_lens: LensSpec,
    in_h: int,
    in_w: int,
    out_h: int,
    out_w: int,
    interp: str = "bicubic",
    n_samples: int = 1,
    tile_rows: int = TR,
    n_groups: int = 0,
    rb: int = RB,
    scan_unroll: int = 0,
    cb: int = 0,
    row0=0,
    band_rows: int = 0,
    channels: int = 3,
    with_rescue: bool = False,
    rescue_budgets=None,
    return_parts: bool = False,
    pixel_valid: bool = False,
    split_pieces: int = 0,
) -> Tuple[Array, ...]:
    """Precompute the per-tile window scalars + overflow mask (a "plan").

    The prepass depends only on the lens configuration — not on pixel
    data — so a frame stream sharing one config (the pipeline's directory
    mode, reference src/main.cpp:536-657) computes it once and passes the
    result to ``remap_pallas(..., prepass=...)``, saving ~10% per frame.
    Supersampled runs union the windows over the extreme stratified
    offsets so one plan covers every launch.

    ``with_rescue=True`` returns (scalars, bad, rescue): the extra
    per-sub-tile pass-2 window fields, computed against
    ``rescue_budgets`` (an (ng, g) pair, default module constants —
    remap_fused.choose_rescue_budgets picks per config). Size
    ``rescue_cap`` from ``int((bad & (rescue[3] > 0)).sum())`` — the
    prepass is config-only, so the count is constant across the frame
    stream. ``return_parts=True`` instead returns (scalars, bad, parts):
    the per-sub-tile window extremes for host-side budget selection.
    ``pixel_valid=True`` (scan-body plans only) appends a per-pixel
    kernel-exactness mask — pass it to
    ``remap_pallas(..., valid_px=...)`` for the PIXEL-granular patch
    (resample only the truly-invalid pixels of bad sub-tiles instead of
    whole 8x128 blocks; measured invalid fractions: 39% of bad-sub-tile
    pixels on BASELINE cfg2, 85% on cfg4's fold ring).
    """
    if n_groups <= 0:
        n_groups = _active_groups(tile_rows)
    n_groups = min(n_groups, _max_groups(rb))
    if cb <= 0:
        cb = CB
    if band_rows <= 0:
        band_rows = out_h
    n_ty = -(-band_rows // tile_rows)
    n_tx = -(-out_w // TC)
    wrap = wrap_mode_for_input(in_lens)
    # Mirror _pad_source's shape arithmetic without touching pixels.
    h_pad = in_h + PAD + (_ceil_to(in_h + 2 * PAD, rb) - (in_h + PAD))
    h_pad = max(h_pad, 2 * rb)
    if wrap:
        w_now = in_w + PAD + (cb + 2 * PAD + 2 * MARGIN)
    else:
        w_now = in_w + 2 * PAD
    w_pad = max(_ceil_to(w_now, cb), 2 * cb)
    su_eff, gchunks, ww2 = _resolve_su(scan_unroll, channels)
    return _prepass(
        in_lens, out_lens, in_h, in_w, out_h, out_w,
        rotation, _prepass_offsets(n_samples), interp, wrap, n_ty, n_tx,
        h_pad // rb - 1, w_pad // cb - 1, tile_rows, n_groups,
        row0=row0, rb=rb, scan_unroll=su_eff, cb=cb,
        max_chunks=1 if gchunks else 0, ww2=ww2,
        rescue_channels=channels if with_rescue else 0,
        rescue_budgets=rescue_budgets,
        return_parts=return_parts,
        pixel_valid=pixel_valid,
        split_pieces=split_pieces if with_rescue else 0,
    )


def remap_pallas(
    src: Array,
    rotation: Optional[Array],
    *,
    in_lens: LensSpec,
    out_lens: LensSpec,
    out_h: int,
    out_w: int,
    interp: str = "bicubic",
    n_samples: int = 1,
    exposure: float = 1.0,
    reinhard: float = 1.0,
    tile_rows: int = TR,
    n_groups: int = 0,
    rb: int = RB,
    scan_unroll: int = 0,
    cb: int = 0,
    row0=0,
    band_rows: int = 0,
    prepass: Optional[Tuple[Array, ...]] = None,
    rescue_cap: int = 0,
    rescue_budgets=None,
    valid_px: Optional[Array] = None,
    pixel_patch: bool = False,
    split_cap: int = 0,
) -> Array:
    """Full fused remap via the Pallas kernel (XLA fallback under the hood).

    ``tile_rows``/``n_groups``/``rb``: taller tiles amortize the per-scan-
    column read/transpose/roll over more output rows but need the tile's
    source row span to stay within the group window (n_groups*8 rows,
    bounded by the 2*rb block height) — see ``suggest_tiling`` for a safe
    choice.

    ``prepass``: (scalars, bad) or (scalars, bad, rescue) from
    make_prepass; pass ``rescue_cap`` > 0 (static, sized from the plan's
    rescuable count) with the 3-tuple to enable the pass-2 rescue.
    ``rescue_budgets``: the (ng, g) pair the rescue fields were computed
    with — MUST match the make_prepass call (defaults match defaults).

    ``valid_px``: per-pixel kernel-exactness mask from
    make_prepass(pixel_valid=True) — switches the overflow patch to
    PIXEL granularity (only ~valid_px pixels of bad sub-tiles are
    resampled). ``pixel_patch=True`` computes it inline when no
    ``prepass`` was supplied (scan-body launches only).
    """
    from .. import color as color_ops

    if rescue_cap > 0:
        r_ng, r_g = rescue_budgets if rescue_budgets else (RESCUE_NG, RESCUE_G)
        if not rescue_feasible(r_ng, r_g, int(src.shape[2]),
                               _interp_taps(interp)):
            # Deliberate compiles of infeasible combos (the VMEM probe)
            # go through here too, so warn rather than raise; the
            # planner never picks these.
            warnings.warn(
                f"rescue budgets (ng={r_ng}, g={r_g}) are outside the "
                f"measured scoped-VMEM feasibility for C={src.shape[2]} "
                f"{interp}: expect a Mosaic compile failure on hardware "
                "(see remap_kernel._RESCUE_VMEM_OK)",
                stacklevel=2,
            )

    offsets = remap_ops.supersample_offsets(n_samples)

    # For n > 1 (or a caller-supplied plan), compute padding/blocks/prepass
    # ONCE: the block stack is offset-independent, and a prepass that
    # unions the windows over the extreme stratified offsets bounds every
    # launch's taps.
    shared = None
    cb_eff = cb if cb > 0 else CB
    if prepass is not None or n_samples > 1 or pixel_patch:
        wrap = wrap_mode_for_input(in_lens)
        padded, h_pad, w_pad = _pad_source(src, wrap, rb, cb_eff)
        if prepass is not None:
            # Unpack by FIELD SHAPE, not position: extras past (scalars,
            # bad) are the 4-stack rescue fields (ndim 4) and/or the
            # per-pixel validity mask (ndim 2, output-grid shaped) in
            # either order — a pixel_valid-only prepass must never land
            # its mask in the rescue slot (ADVICE r4 low).
            scalars, bad = prepass[0], prepass[1]
            rescue_f = None
            split_f = None
            for extra in prepass[2:]:
                if extra is None:
                    continue
                if extra.ndim == 4:
                    rescue_f = extra
                elif extra.ndim == 5:
                    split_f = extra
                elif extra.ndim == 2:
                    if valid_px is None:
                        valid_px = extra
                else:
                    raise ValueError(
                        "unrecognized prepass field of ndim "
                        f"{extra.ndim} (expected rescue stack ndim 4, "
                        "split stack ndim 5, or valid_px mask ndim 2)"
                    )
        else:
            in_h, in_w = int(src.shape[0]), int(src.shape[1])
            if n_groups <= 0:
                n_groups_eff = _active_groups(tile_rows)
            else:
                n_groups_eff = min(n_groups, _max_groups(rb))
            n_ty = -(-(band_rows if band_rows > 0 else out_h) // tile_rows)
            n_tx = -(-out_w // TC)
            su_eff, gch, ww2_eff = _resolve_su(scan_unroll, int(src.shape[2]))
            with_rescue_f = rescue_cap > 0
            pre = _prepass(
                in_lens, out_lens, in_h, in_w, out_h, out_w,
                rotation, _prepass_offsets(n_samples), interp, wrap,
                n_ty, n_tx, h_pad // rb - 1, w_pad // cb_eff - 1, tile_rows,
                n_groups_eff, row0=row0, rb=rb, scan_unroll=su_eff,
                cb=cb_eff, max_chunks=1 if gch else 0, ww2=ww2_eff,
                rescue_channels=int(src.shape[2]) if with_rescue_f else 0,
                rescue_budgets=rescue_budgets,
                pixel_valid=pixel_patch,
                split_pieces=2 if split_cap > 0 and with_rescue_f else 0,
            )
            scalars, bad = pre[:2]
            rest = list(pre[2:])
            rescue_f = rest.pop(0) if with_rescue_f and rest else None
            split_f = (
                rest.pop(0)
                if split_cap > 0 and with_rescue_f and rest
                else None
            )
            if rest and valid_px is None:
                valid_px = rest.pop(0)
        if split_f is not None:
            shared = (padded, scalars, bad, rescue_f, split_f)
        elif rescue_f is not None:
            shared = (padded, scalars, bad, rescue_f)
        else:
            shared = (padded, scalars, bad)

    acc = None
    for off_x in offsets:
        for off_y in offsets:
            out, _ok = _remap_pallas_one(
                src, rotation,
                in_lens=in_lens, out_lens=out_lens,
                out_h=out_h, out_w=out_w, interp=interp,
                off_x=float(off_x), off_y=float(off_y),
                tile_rows=tile_rows, n_groups=n_groups, rb=rb,
                scan_unroll=scan_unroll, cb=cb,
                shared=shared, row0=row0, band_rows=band_rows,
                rescue_cap=rescue_cap, rescue_budgets=rescue_budgets,
                valid_px=valid_px, split_cap=split_cap,
            )
            acc = out if acc is None else acc + out
    result = acc * jnp.float32(1.0 / (n_samples * n_samples))
    if exposure != 1.0 or reinhard != 1.0:
        result = color_ops.post_process(result, exposure, reinhard, xp=jnp)
    return result
