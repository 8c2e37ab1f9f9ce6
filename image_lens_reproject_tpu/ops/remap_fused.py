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
        "rescue_cap", "rescue_budgets",
    ),
)
def remap_tonemap_planned(
    src: jax.Array,
    rotation: Optional[jax.Array],
    scalars: jax.Array,
    bad: jax.Array,
    rescue: Optional[jax.Array] = None,
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
) -> jax.Array:
    """remap_tonemap with a precomputed prepass (see make_plan).

    The prepass depends only on the lens configuration, so a frame stream
    (pipeline directory mode) computes it once — ~10% per-frame saving at
    4K, more at smaller resolutions. Pass ``rescue`` (from
    make_plan(with_rescue=True)) plus a static ``rescue_cap`` > 0 to
    recompute rescuable overflow sub-tiles with the exact pass-2 kernel
    instead of the XLA patch; ``rescue_budgets`` must be the same (ng, g)
    the plan was computed with.
    """
    from .pallas import remap_kernel

    pre = (scalars, bad) if rescue is None else (scalars, bad, rescue)
    return remap_kernel.remap_pallas(
        src, rotation,
        in_lens=in_lens, out_lens=out_lens, out_h=out_h, out_w=out_w,
        interp=interp, n_samples=n_samples, exposure=exposure,
        reinhard=reinhard, tile_rows=tile_rows, n_groups=n_groups, rb=rb,
        scan_unroll=scan_unroll, cb=cb, prepass=pre,
        rescue_cap=rescue_cap if rescue is not None else 0,
        rescue_budgets=rescue_budgets,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "in_lens", "out_lens", "out_h", "out_w", "interp", "n_samples",
        "exposure", "reinhard", "tile_rows", "n_groups", "rb", "scan_unroll", "cb",
        "rescue_cap", "rescue_budgets",
    ),
)
def remap_tonemap_planned_batch(
    batch: jax.Array,
    rotation: Optional[jax.Array],
    scalars: jax.Array,
    bad: jax.Array,
    rescue: Optional[jax.Array] = None,
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
) -> jax.Array:
    """(B, H, W, C) -> (B, out_h, out_w, C) in ONE device dispatch.

    lax.scan over the batch inside a single jit: the Pallas launch and
    its prepass plan are traced once and the whole frame batch runs as
    one program — dispatch latency (tunnel ~ms per call) is paid once
    per batch instead of once per frame.
    """
    from .pallas import remap_kernel

    pre = (scalars, bad) if rescue is None else (scalars, bad, rescue)
    cap = rescue_cap if rescue is not None else 0

    def body(_, img):
        out = remap_kernel.remap_pallas(
            img, rotation,
            in_lens=in_lens, out_lens=out_lens, out_h=out_h, out_w=out_w,
            interp=interp, n_samples=n_samples, exposure=exposure,
            reinhard=reinhard, tile_rows=tile_rows, n_groups=n_groups,
            rb=rb, scan_unroll=scan_unroll, cb=cb, prepass=pre,
            rescue_cap=cap, rescue_budgets=rescue_budgets,
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
):
    """Device-compute the reusable (scalars, bad[, rescue]) prepass for one
    config. ``with_rescue=True`` adds the pass-2 per-sub-tile window
    fields, checked against ``rescue_budgets`` (see
    remap_kernel.make_prepass; choose_rescue_budgets picks per config)."""
    from .pallas import remap_kernel

    fn = jax.jit(
        functools.partial(
            remap_kernel.make_prepass,
            in_lens=in_lens, out_lens=out_lens, in_h=in_h, in_w=in_w,
            out_h=out_h, out_w=out_w, interp=interp, n_samples=n_samples,
            tile_rows=tile_rows, n_groups=n_groups, rb=rb,
            scan_unroll=scan_unroll, cb=cb, channels=channels,
            with_rescue=with_rescue, rescue_budgets=rescue_budgets,
            return_parts=return_parts,
        )
    )
    return fn(rotation)


def rescue_cost_ns_per_px(ng: int, g: int, channels: int, taps: int) -> float:
    """Modeled pass-2 cost per rescued pixel; see remap_kernel's copy."""
    from .pallas import remap_kernel

    return remap_kernel.rescue_cost_ns_per_px(ng, g, channels, taps)


def choose_rescue_budgets(
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
):
    """Pick the savings-maximizing (ng, g) rescue budgets for one config.

    Runs the prepass once in diagnostics mode (per-sub-tile window
    extremes), then scores every RESCUE_LADDER entry by
    sum(admitted) * (patch_cost - rescue_cost(ng, g)) — taller/wider
    budgets admit more bad sub-tiles but cost more per slot, so e.g. the
    equisolid->equirect polar arcs pick (12, 6) while a config whose
    overflow is dominated by frame-wide folds stays at the (8, 6)
    default. Config-only; the pipeline caches the choice in its plan.
    """
    import numpy as np

    from .pallas import remap_kernel as RK

    _, bad, parts = make_plan(
        rotation, in_lens=in_lens, out_lens=out_lens, in_h=in_h, in_w=in_w,
        out_h=out_h, out_w=out_w, interp=interp, n_samples=n_samples,
        tile_rows=tile_rows, n_groups=n_groups, rb=rb,
        scan_unroll=scan_unroll, cb=cb, channels=channels,
        return_parts=True,
    )
    bad = np.asarray(bad)
    margin = RK._margin_for(interp)
    span2 = (np.asarray(parts["rmax_sub"]) - np.asarray(parts["rmin_sub"])
             + 2 * margin + 1)
    ext2 = (np.asarray(parts["cmax_sub"]) - np.asarray(parts["cmin_sub"])
            + 2 * margin + 1)
    taps = {"nearest": 1, "bilinear": 2, "bicubic": 4}[interp]
    patch_ns = RK._PATCH_NS_PER_PX
    best, best_saving = (RK.RESCUE_NG, RK.RESCUE_G), -1.0
    for ng, g in RK.RESCUE_LADDER:
        cost = rescue_cost_ns_per_px(ng, g, channels, taps)
        if cost >= patch_ns:
            continue
        admitted = int(np.sum(bad & (span2 <= ng * 8)
                              & (ext2 * channels <= g * 128)))
        saving = admitted * (patch_ns - cost)
        if saving > best_saving:
            best, best_saving = (ng, g), saving
    return best
