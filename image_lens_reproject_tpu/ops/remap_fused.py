"""Fused remap + tonemap: the framework's single-image hot entry point.

One jitted program: coordinate field -> rotate -> project -> gather
interpolate -> exposure/Reinhard. XLA fuses the elementwise stages around
the gathers; on TPU the Pallas kernel path (ops/pallas/remap_kernel.py)
replaces the gather stage when eligible, unless --pure-xla forces the
reference XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.lens import LensSpec
from . import color as color_ops
from . import dispatch
from . import remap as remap_ops


@functools.partial(
    jax.jit,
    static_argnames=(
        "in_lens",
        "out_lens",
        "out_h",
        "out_w",
        "interp",
        "n_samples",
        "exposure",
        "reinhard",
        "tile_rows",
        "n_groups",
        "rb",
        "scan_unroll",
        "cb",
    ),
)
def remap_tonemap(
    src: jax.Array,
    rotation: Optional[jax.Array],
    *,
    in_lens: LensSpec,
    out_lens: LensSpec,
    out_h: int,
    out_w: int,
    interp: str = "bicubic",
    n_samples: int = 1,
    exposure: float = 1.0,
    reinhard: float = 1.0,
    tile_rows: int = 8,
    n_groups: int = 0,
    rb: int = 40,
    scan_unroll: int = 0,
    cb: int = 0,
) -> jax.Array:
    """(H, W, C) -> (out_h, out_w, C), remap + optional tonemap, one program."""
    use_pallas = False
    if not dispatch.pure_xla_forced():
        from .pallas import remap_kernel

        on_tpu = jax.default_backend() == "tpu" or remap_kernel._INTERPRET
        use_pallas = on_tpu and remap_kernel.supported(
            src, in_lens, out_lens, interp, n_samples
        )

    if use_pallas:
        from .pallas import remap_kernel

        out = remap_kernel.remap_pallas(
            src,
            rotation,
            in_lens=in_lens,
            out_lens=out_lens,
            out_h=out_h,
            out_w=out_w,
            interp=interp,
            n_samples=n_samples,
            exposure=exposure,
            reinhard=reinhard,
            tile_rows=tile_rows,
            n_groups=n_groups,
            rb=rb,
            scan_unroll=scan_unroll,
            cb=cb,
        )
        return out

    out = remap_ops.remap_image(
        src,
        rotation,
        in_lens=in_lens,
        out_lens=out_lens,
        out_h=out_h,
        out_w=out_w,
        interp=interp,
        n_samples=n_samples,
    )
    if exposure != 1.0 or reinhard != 1.0:
        out = color_ops.post_process(out, exposure, reinhard)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "in_lens", "out_lens", "out_h", "out_w", "interp", "n_samples",
        "exposure", "reinhard", "tile_rows", "n_groups", "rb", "scan_unroll", "cb",
        "rescue_cap", "rescue_budgets", "split_cap",
    ),
)
def remap_tonemap_planned(
    src: jax.Array,
    rotation: Optional[jax.Array],
    scalars: jax.Array,
    bad: jax.Array,
    rescue: Optional[jax.Array] = None,
    valid_px: Optional[jax.Array] = None,
    split: Optional[jax.Array] = None,
    *,
    in_lens: LensSpec,
    out_lens: LensSpec,
    out_h: int,
    out_w: int,
    interp: str = "bicubic",
    n_samples: int = 1,
    exposure: float = 1.0,
    reinhard: float = 1.0,
    tile_rows: int = 8,
    n_groups: int = 0,
    rb: int = 40,
    scan_unroll: int = 0,
    cb: int = 0,
    rescue_cap: int = 0,
    rescue_budgets=None,
    split_cap: int = 0,
) -> jax.Array:
    """remap_tonemap with a precomputed prepass (see make_plan).

    The prepass depends only on the lens configuration, so a frame stream
    (pipeline directory mode) computes it once — ~10% per-frame saving at
    4K, more at smaller resolutions. Pass ``rescue`` (from
    make_plan(with_rescue=True)) plus a static ``rescue_cap`` > 0 to
    recompute rescuable overflow sub-tiles with the exact pass-2 kernel
    instead of the XLA patch; ``rescue_budgets`` must be the same (ng, g)
    the plan was computed with. Pass ``valid_px`` (from
    plan_with_rescue(pixel_patch=True)) to patch overflow at PIXEL
    granularity — only bad-sub-tile pixels the kernel did not compute
    exactly are resampled instead of whole 8x128 blocks. Pass ``split``
    (from make_plan(split_pieces=2)) plus a static ``split_cap`` > 0 to
    also run the pass-2b split rescue on still-patched sub-tiles whose
    8x64 halves both fit per-piece windows.
    """
    from .pallas import remap_kernel

    pre = (scalars, bad) + tuple(
        f for f in (rescue, split) if f is not None)
    return remap_kernel.remap_pallas(
        src, rotation,
        in_lens=in_lens, out_lens=out_lens, out_h=out_h, out_w=out_w,
        interp=interp, n_samples=n_samples, exposure=exposure,
        reinhard=reinhard, tile_rows=tile_rows, n_groups=n_groups, rb=rb,
        scan_unroll=scan_unroll, cb=cb, prepass=pre,
        rescue_cap=rescue_cap if rescue is not None else 0,
        rescue_budgets=rescue_budgets,
        valid_px=valid_px,
        split_cap=split_cap if split is not None else 0,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "in_lens", "out_lens", "out_h", "out_w", "interp", "n_samples",
        "exposure", "reinhard", "tile_rows", "n_groups", "rb", "scan_unroll", "cb",
        "rescue_cap", "rescue_budgets", "split_cap",
    ),
)
def remap_tonemap_planned_batch(
    batch: jax.Array,
    rotation: Optional[jax.Array],
    scalars: jax.Array,
    bad: jax.Array,
    rescue: Optional[jax.Array] = None,
    valid_px: Optional[jax.Array] = None,
    split: Optional[jax.Array] = None,
    *,
    in_lens: LensSpec,
    out_lens: LensSpec,
    out_h: int,
    out_w: int,
    interp: str = "bicubic",
    n_samples: int = 1,
    exposure: float = 1.0,
    reinhard: float = 1.0,
    tile_rows: int = 8,
    n_groups: int = 0,
    rb: int = 40,
    scan_unroll: int = 0,
    cb: int = 0,
    rescue_cap: int = 0,
    rescue_budgets=None,
    split_cap: int = 0,
) -> jax.Array:
    """(B, H, W, C) -> (B, out_h, out_w, C) in ONE device dispatch.

    lax.scan over the batch inside a single jit: the Pallas launch and
    its prepass plan are traced once and the whole frame batch runs as
    one program — dispatch latency (tunnel ~ms per call) is paid once
    per batch instead of once per frame.
    """
    from .pallas import remap_kernel

    pre = (scalars, bad) + tuple(
        f for f in (rescue, split) if f is not None)
    cap = rescue_cap if rescue is not None else 0
    s_cap = split_cap if split is not None else 0

    def body(_, img):
        out = remap_kernel.remap_pallas(
            img, rotation,
            in_lens=in_lens, out_lens=out_lens, out_h=out_h, out_w=out_w,
            interp=interp, n_samples=n_samples, exposure=exposure,
            reinhard=reinhard, tile_rows=tile_rows, n_groups=n_groups,
            rb=rb, scan_unroll=scan_unroll, cb=cb, prepass=pre,
            rescue_cap=cap, rescue_budgets=rescue_budgets,
            valid_px=valid_px, split_cap=s_cap,
        )
        return None, out

    _, outs = jax.lax.scan(body, None, batch)
    return outs


def make_plan(
    rotation: Optional[jax.Array],
    *,
    in_lens: LensSpec,
    out_lens: LensSpec,
    in_h: int,
    in_w: int,
    out_h: int,
    out_w: int,
    interp: str = "bicubic",
    n_samples: int = 1,
    tile_rows: int = 8,
    n_groups: int = 0,
    rb: int = 40,
    scan_unroll: int = 0,
    cb: int = 0,
    channels: int = 3,
    with_rescue: bool = False,
    rescue_budgets=None,
    return_parts: bool = False,
    pixel_valid: bool = False,
    split_pieces: int = 0,
):
    """Device-compute the reusable (scalars, bad[, rescue]) prepass for one
    config. ``with_rescue=True`` adds the pass-2 per-sub-tile window
    fields, checked against ``rescue_budgets`` (see
    remap_kernel.make_prepass; choose_rescue_budgets picks per config).
    ``pixel_valid=True`` appends the per-pixel kernel-exactness mask
    (None for ww2/whole-window plans — scan-body only).
    ``split_pieces=2`` (with rescue) appends the pass-2b per-half-piece
    window fields for the split rescue."""
    from .pallas import remap_kernel

    fn = jax.jit(
        functools.partial(
            remap_kernel.make_prepass,
            in_lens=in_lens, out_lens=out_lens, in_h=in_h, in_w=in_w,
            out_h=out_h, out_w=out_w, interp=interp, n_samples=n_samples,
            tile_rows=tile_rows, n_groups=n_groups, rb=rb,
            scan_unroll=scan_unroll, cb=cb, channels=channels,
            with_rescue=with_rescue, rescue_budgets=rescue_budgets,
            return_parts=return_parts, pixel_valid=pixel_valid,
            split_pieces=split_pieces,
        )
    )
    return fn(rotation)


def rescue_cost_ns_per_px(ng: int, g: int, channels: int, taps: int) -> float:
    """Modeled pass-2 cost per rescued pixel; see remap_kernel's copy."""
    from .pallas import remap_kernel

    return remap_kernel.rescue_cost_ns_per_px(ng, g, channels, taps)


def plan_with_rescue(
    rotation: Optional[jax.Array],
    *,
    use_rescue: bool,
    pixel_patch: bool = False,
    split: bool = False,
    **plan_kw,
):
    """Build the frame-stream plan, ladder-choosing the rescue budgets.

    The single construction path shared by the pipeline, bench.py and
    bench/baseline_configs (one implementation to keep in lockstep).
    Returns (scalars, bad, rescue, rescue_cap, rescue_budgets,
    valid_px); rescue is None (cap 0, budgets None) when disabled or
    nothing is rescuable. ``split=True`` appends (split, split_cap)
    for the pass-2b split rescue (deterministic arity — None/0 when
    the chooser rejects it); gate it on dispatch.split_enabled().

    With rescue enabled, every admissible RESCUE_LADDER entry gets its
    own prepass and the EXACT admitted count (``bad & rescue[3] > 0`` —
    including the window-fit/seam/c_start constraints the prepass
    applies, not just the span/extent bounds); the entry maximizing
    admitted * (patch_cost - rescue_cost(ng, g)) wins. Config-only work:
    callers cache the result per (shape, config).

    ``pixel_patch=True`` additionally builds the PIXEL-granular patch
    list (remap_kernel.compact_valid_px — the per-frame mask+compaction
    hoisted into the config-only plan): ``valid_px`` is an int32 (2, N)
    coordinate stack to pass straight to the planned entry points. It
    stays None when the plan is not scan-body (ww2/whole-window), when
    nothing is patched, when the invalid pixels exceed the 60% launch
    cap (the launch takes full XLA anyway), or when the MODELED pixel
    patch loses to the sub-tile block patch: the unstructured per-pixel
    scatter measures ~2.4-3.9x the block patch's per-pixel cost
    (remap_kernel._PX_PATCH_NS_PER_PX, r5 on-chip probes), so the finer
    granularity only pays when the truly-invalid fraction of the
    patched blocks is small (< ~25% at the current constants).
    """
    import numpy as np

    from .pallas import remap_kernel as RK

    def finish(scalars, bad, rescue, rescue_cap, budgets, vpx,
               split_f=None, split_cap=0):
        valid_px = None
        if pixel_patch and vpx is not None:
            tile_rows = plan_kw.get("tile_rows", RK.TR)
            compact = RK.compact_valid_px(
                bad, rescue, rescue_cap, vpx, tile_rows=tile_rows)
            n_inv = int(np.asarray(jnp.sum(compact[0] >= 0)))
            if rescue is not None and rescue_cap > 0:
                pm = jnp.logical_and(bad, jnp.logical_not(
                    RK._rescue_taken(bad, rescue, rescue_cap)))
            else:
                pm = bad
            bad_px = int(np.asarray(jnp.sum(pm))) * 8 * RK.TC
            _, max_bad_px, cap_padded_px = RK._px_patch_sizes(
                bad.shape[0] * tile_rows * bad.shape[2] * RK.TC)
            if (
                0 < n_inv <= max_bad_px
                and n_inv < cap_padded_px  # complete list, no truncation
                # Cost-based admission (r5 measured): the pixel list's
                # unstructured sampling+scatter runs at _PX_PATCH_NS
                # per patched pixel vs _PATCH_NS for the block patch —
                # enabling it on a mostly-invalid patch set is a
                # measured 2x net LOSS (cfg2 101.7 -> 45.2 Mpix/s,
                # bench/recovery_out/cfg2px_r5.log).
                and n_inv * RK._PX_PATCH_NS_PER_PX
                    < bad_px * RK._PATCH_NS_PER_PX
            ):
                valid_px = compact
        if split_cap > 0 and valid_px is not None:
            # The pixel list is compacted against the pre-split patched
            # set; running both would re-patch split-rescued pixels with
            # identical values at full pixel-list cost. The split's
            # admission already beat the effective patch — drop the list.
            valid_px = None
        out = (scalars, bad, rescue, rescue_cap, budgets, valid_px)
        if split:
            # Deterministic arity: requesting split always appends the
            # two fields (None/0 when disabled or nothing is admitted).
            out = out + (split_f, split_cap)
        return out

    if not use_rescue:
        plan = make_plan(rotation, with_rescue=False,
                         pixel_valid=pixel_patch, **plan_kw)
        vpx = plan[2] if pixel_patch else None
        return finish(plan[0], plan[1], None, 0, None, vpx)

    taps = RK._interp_taps(plan_kw.get("interp", "bicubic"))
    channels = plan_kw.get("channels", 3)
    patch_ns = RK._PATCH_NS_PER_PX
    # JOINT ranking (r5): rescue competes against the CHEAPER of the two
    # patch modes, not just the block patch. With pixel_patch requested,
    # one no-rescue prepass measures the truly-invalid fraction f_inv of
    # bad-sub-tile pixels (config-only); a sub-tile the rescue skips then
    # costs min(block, f_inv * px) per pixel, which devalues rescue
    # exactly when the pixel list is cheap (cfg2: 61% of patched pixels
    # were never invalid). finish() still makes the exact px-vs-block
    # call on the winner's remainder set.
    eff_patch_ns = patch_ns
    if pixel_patch:
        tile_rows = plan_kw.get("tile_rows", RK.TR)
        base = make_plan(rotation, with_rescue=False, pixel_valid=True,
                         **plan_kw)
        b_scalars, b_bad, b_vpx = base
        if b_vpx is not None:
            n_bad_sub = int(np.asarray(jnp.sum(b_bad)))
            compact = RK.compact_valid_px(
                b_bad, None, 0, b_vpx, tile_rows=tile_rows)
            n_inv = int(np.asarray(jnp.sum(compact[0] >= 0)))
            _, max_bad_px, cap_padded_px = RK._px_patch_sizes(
                b_bad.shape[0] * tile_rows * b_bad.shape[2] * RK.TC)
            if 0 < n_inv <= max_bad_px and n_inv < cap_padded_px \
                    and n_bad_sub > 0:
                f_inv = n_inv / float(n_bad_sub * 8 * RK.TC)
                eff_patch_ns = min(
                    patch_ns, f_inv * RK._PX_PATCH_NS_PER_PX)
    best = None  # (saving, plan, n_resc, budgets)
    for ng, g in RK.RESCUE_LADDER:
        if not RK.rescue_feasible(ng, g, channels, taps):
            # Budgets whose compact launch cannot COMPILE on hardware
            # (Mosaic scoped-VMEM stack > 16 MiB) — e.g. bicubic beyond
            # C=3 at the default budgets. Skipping falls back to the
            # XLA patch for those sub-tiles, never a compile crash.
            continue
        cost = RK.rescue_cost_ns_per_px(ng, g, channels, taps)
        if cost >= eff_patch_ns:
            continue
        plan = make_plan(rotation, with_rescue=True,
                         rescue_budgets=(ng, g), **plan_kw)
        scalars, bad, rescue = plan
        n_adm = int(np.asarray(jnp.sum(jnp.logical_and(bad, rescue[3] > 0))))
        # Net saving in ns: admitted pixels times the per-pixel margin,
        # minus the fixed per-launch cost (fitted, see remap_kernel
        # _RESCUE_LAUNCH_NS) — a small rescue that does not clear the
        # launch overhead is a measured net loss (cfg4, `git 878b492`).
        saving = n_adm * 1024 * (eff_patch_ns - cost) - RK._RESCUE_LAUNCH_NS
        if (best is None or saving > best[0]) and saving > 0:
            best = (saving, plan, n_adm, (ng, g))
    if best is None:
        # No ladder entry beats the effective patch for this
        # (channels, taps, f_inv) — e.g. very wide channel counts under
        # bicubic, or a cheap pixel list (the upfront base plan is then
        # reused; no duplicate prepass).
        if pixel_patch:
            return finish(b_scalars, b_bad, None, 0, None, b_vpx)
        plan = make_plan(rotation, with_rescue=False, **plan_kw)
        return finish(plan[0], plan[1], None, 0, None, None)
    scalars, bad, rescue = best[1]
    n_resc, budgets = best[2], best[3]
    rescue_cap = -(-n_resc // 128) * 128 if n_resc else 0
    if rescue_cap == 0:
        rescue, budgets = None, None
    split_f, split_cap = None, 0
    if split and rescue is not None and RK.split_feasible(
            budgets[1], channels, taps):
        # Pass-2b SPLIT admission at the winning budgets: still-patched
        # sub-tiles BOTH of whose 8x64 halves fit per-piece windows
        # under half the lane budget (cluster-jump windows — seam
        # monotonization, polar-arc reversals — that no contiguous
        # whole-window covers; cfg2 measured 60.6% of its patched set,
        # bench/overflow_split_probe.py). Same per-slot body cost as the
        # whole rescue; a second launch must clear its own fixed cost.
        plan_s = make_plan(rotation, with_rescue=True,
                           rescue_budgets=budgets, split_pieces=2,
                           **plan_kw)
        sf = plan_s[3] if len(plan_s) > 3 else None
        if sf is not None:
            pm = jnp.logical_and(bad, jnp.logical_not(
                RK._rescue_taken(bad, rescue, rescue_cap)))
            n_split = int(np.asarray(jnp.sum(jnp.logical_and(
                pm, jnp.all(sf[3] > 0, axis=3)))))
            cost = RK.rescue_cost_ns_per_px(
                budgets[0], budgets[1], channels, taps)
            saving_s = (n_split * 1024 * (eff_patch_ns - cost)
                        - RK._RESCUE_LAUNCH_NS)
            if n_split > 0 and saving_s > 0:
                split_f = sf
                split_cap = -(-n_split // 128) * 128
    vpx = None
    if pixel_patch:
        # The per-pixel mask is budget-independent; one extra prepass
        # with the WINNING budgets fetches it (config-only work).
        plan = make_plan(rotation, with_rescue=rescue is not None,
                         rescue_budgets=budgets, pixel_valid=True,
                         **plan_kw)
        vpx = plan[3] if rescue is not None else plan[2]
    return finish(scalars, bad, rescue, rescue_cap, budgets, vpx,
                  split_f, split_cap)


def choose_rescue_budgets(rotation: Optional[jax.Array], **plan_kw):
    """The (ng, g) budgets plan_with_rescue would pick (None if rescue
    would be empty). Kept as the budget-only query; plan construction
    should go through plan_with_rescue."""
    return plan_with_rescue(rotation, use_rescue=True, **plan_kw)[4]
