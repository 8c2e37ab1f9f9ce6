"""Shared tap-index / fraction computation for the Pallas remap kernel.

Produces, for a field of source coordinates, the integer tap indices and
interpolation fractions with EXACTLY the reference's semantics
(truncation-toward-zero, wrap vs clamp, fractions measured against the
post-wrap/clamp low tap — see ops/sampling.py and reference
src/reproject.cpp:37-148). Used identically by the XLA window prepass and
inside the kernel so both sides agree on which source texels a tile needs.

All functions are xp-generic (jnp in XLA/kernels, numpy in tests).
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Tuple

import jax.numpy as jnp

from ..sampling import _clamp, _trunc_i32, _wrap_w, cubic_weights

Array = Any

# tap x-offsets per interpolation mode, in trunc(sx + k) form
_X_OFFSETS = {
    "nearest": (0.5,),
    "bilinear": (0.0, 1.0),
    "bicubic": (-1.0, 0.0, 1.0, 2.0),
}


class Taps(NamedTuple):
    """Integer taps + per-tap weights for one axis.

    idx:     list of tap index arrays (post wrap/clamp, UNpadded space)
    weights: list of per-tap weight arrays (same length)
    """

    idx: List[Array]
    weights: List[Array]


def x_taps(sx: Array, width: int, interp: str, wrap: bool, xp=jnp) -> Taps:
    offs = _X_OFFSETS[interp]
    idx = []
    for k in offs:
        i = _trunc_i32(xp, sx + xp.float32(k))
        idx.append(_wrap_w(xp, i, width) if wrap else _clamp(xp, i, width - 1))
    if interp == "nearest":
        weights = [xp.ones_like(sx)]
    elif interp == "bilinear":
        fx = xp.clip(sx - idx[0].astype(xp.float32), xp.float32(0.0), xp.float32(1.0))
        weights = [xp.float32(1.0) - fx, fx]
    else:  # bicubic
        fx = xp.clip(sx - idx[1].astype(xp.float32), xp.float32(0.0), xp.float32(1.0))
        weights = list(cubic_weights(xp, fx))
    return Taps(idx=idx, weights=weights)


def y_taps(sy: Array, height: int, interp: str, xp=jnp) -> Taps:
    offs = _X_OFFSETS[interp]
    idx = [_clamp(xp, _trunc_i32(xp, sy + xp.float32(k)), height - 1) for k in offs]
    if interp == "nearest":
        weights = [xp.ones_like(sy)]
    elif interp == "bilinear":
        fy = xp.clip(sy - idx[0].astype(xp.float32), xp.float32(0.0), xp.float32(1.0))
        weights = [xp.float32(1.0) - fy, fy]
    else:
        fy = xp.clip(sy - idx[1].astype(xp.float32), xp.float32(0.0), xp.float32(1.0))
        weights = list(cubic_weights(xp, fy))
    return Taps(idx=idx, weights=weights)


def monotonize_x(idx: Array, width: int, seam: Array, xp=jnp) -> Array:
    """Unwrap tap columns across the 360° seam within a tile.

    On a seam tile (column taps clustered near both 0 and width-1), taps
    below width/2 get +width so the tile's column window is contiguous in
    the wrap-padded source (whose columns [width, width+margin) replicate
    [0, margin)).
    """
    bump = xp.where(seam & (idx < width // 2), xp.int32(width), xp.int32(0))
    return idx + bump
