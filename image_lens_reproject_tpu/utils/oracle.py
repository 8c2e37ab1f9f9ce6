"""Float32 NumPy oracle of the reference remap, for golden tests.

This is an independent re-implementation of the reference's per-pixel
algorithm (src/reproject.cpp:273-346) in float32 numpy, preserving the
reference's *evaluation order* where it affects rounding:

* the bicubic uses the nested Horner form (src/reproject.cpp:92-107),
  not the expanded tap-weight form the device path uses;
* supersamples are accumulated sequentially in float32 then multiplied by
  ``1/(n*n)`` (src/reproject.cpp:280, 334-341);
* per-step float32 arithmetic (numpy float32 ops round each step, like
  the C code).

It realises the test intent of the reference's *empty* self-test
``test_conversion_math`` (src/reproject.cpp:439-467) and serves as the
max-abs-err < 1e-3 golden source for the device path, per SURVEY.md §4.
Slow (pure numpy, small images only) by design — clarity over speed.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..models import projections
from ..models.lens import LensSpec, wrap_mode_for_input

F = np.float32


def _trunc(v: np.ndarray) -> np.ndarray:
    return np.trunc(v).astype(np.int64)


def _index_x(v: np.ndarray, width: int, wrap: bool) -> np.ndarray:
    if wrap:
        return (v + width) % width
    return np.clip(v, 0, width - 1)


def _index_y(v: np.ndarray, height: int) -> np.ndarray:
    return np.clip(v, 0, height - 1)


def _fetch(src: np.ndarray, iy: np.ndarray, ix: np.ndarray) -> np.ndarray:
    return src[iy, ix]  # (..., C)


def oracle_sample(src: np.ndarray, sx: np.ndarray, sy: np.ndarray, interp: str, wrap: bool) -> np.ndarray:
    """Sample (H, W, C) float32 source at float coords; returns (..., C)."""
    h, w = src.shape[0], src.shape[1]
    if interp == "nearest":
        lx = _index_x(_trunc(sx + F(0.5)), w, wrap)
        ly = _index_y(_trunc(sy + F(0.5)), h)
        return _fetch(src, ly, lx)

    if interp == "bilinear":
        lx = _index_x(_trunc(sx), w, wrap)
        ux = _index_x(_trunc(sx + F(1.0)), w, wrap)
        ly = _index_y(_trunc(sy), h)
        uy = _index_y(_trunc(sy + F(1.0)), h)
        fx = np.clip((sx - lx).astype(F), F(0), F(1))[..., None]
        fy = np.clip((sy - ly).astype(F), F(0), F(1))[..., None]
        ll = _fetch(src, ly, lx)
        lu = _fetch(src, ly, ux)
        ul = _fetch(src, uy, lx)
        uu = _fetch(src, uy, ux)
        lo = fx * lu + (F(1) - fx) * ll
        up = fx * uu + (F(1) - fx) * ul
        return fy * up + (F(1) - fy) * lo

    if interp == "bicubic":
        xi = [_index_x(_trunc(sx + F(k)), w, wrap) for k in (-1.0, 0.0, 1.0, 2.0)]
        yi = [_index_y(_trunc(sy + F(k)), h) for k in (-1.0, 0.0, 1.0, 2.0)]
        fx = np.clip((sx - xi[1]).astype(F), F(0), F(1))[..., None]
        fy = np.clip((sy - yi[1]).astype(F), F(0), F(1))[..., None]

        def cubic(p0, p1, p2, p3, t):
            # Horner form, same association as src/reproject.cpp:92-98.
            return p1 + F(0.5) * t * (
                p2 - p0 + t * (
                    F(2.0) * p0 - F(5.0) * p1 + F(4.0) * p2 - p3 + t * (
                        F(3.0) * (p1 - p2) + p3 - p0
                    )
                )
            )

        cols = []
        for k in range(4):
            p = [_fetch(src, yi[j], xi[k]) for j in range(4)]
            cols.append(cubic(p[0], p[1], p[2], p[3], fy))
        return cubic(cols[0], cols[1], cols[2], cols[3], fx)

    raise ValueError(f"Interpolation method not supported: {interp!r}")


def oracle_remap(
    src: np.ndarray,
    rotation: Optional[np.ndarray],
    *,
    in_lens: LensSpec,
    out_lens: LensSpec,
    out_h: int,
    out_w: int,
    interp: str = "bicubic",
    n_samples: int = 1,
) -> np.ndarray:
    """Golden remap: (H_in, W_in, C) float32 -> (out_h, out_w, C) float32."""
    src = np.ascontiguousarray(src, dtype=F)
    in_h, in_w = src.shape[0], src.shape[1]
    wrap = wrap_mode_for_input(in_lens)

    cx = (np.arange(out_w, dtype=F) + F(0.5)) - F(out_w * 0.5)
    cy = (np.arange(out_h, dtype=F) + F(0.5)) - F(out_h * 0.5)
    cx = cx[None, :]
    cy = cy[:, None]

    acc = np.zeros((out_h, out_w, src.shape[2]), dtype=F)
    for ssx in range(n_samples):
        off_x = F((ssx + 1.0) / (n_samples + 1.0) - 0.5)
        for ssy in range(n_samples):
            off_y = F((ssy + 1.0) / (n_samples + 1.0) - 0.5)
            scx = cx + off_x
            scy = cy + off_y
            vx, vy, vz = projections.target_to_vec(
                out_lens, float(out_w), float(out_h), scx, scy, xp=np
            )
            if rotation is not None:
                r = rotation.astype(F)
                nx = r[0, 0] * vx + r[0, 1] * vy + r[0, 2] * vz
                ny = r[1, 0] * vx + r[1, 1] * vy + r[1, 2] * vz
                nz = r[2, 0] * vx + r[2, 1] * vy + r[2, 2] * vz
                vx, vy, vz = nx, ny, nz
            sx, sy = projections.vec_to_source(
                in_lens, float(in_w), float(in_h), vx, vy, vz, xp=np
            )
            sx = (sx - F(0.5)) + F(in_w * 0.5)
            sy = (sy - F(0.5)) + F(in_h * 0.5)
            sx = np.broadcast_to(sx, (out_h, out_w)).astype(F)
            sy = np.broadcast_to(sy, (out_h, out_w)).astype(F)
            acc += oracle_sample(src, sx, sy, interp, wrap)

    return acc * F(1.0 / (n_samples * n_samples))


def oracle_post_process(img: np.ndarray, exposure: float, reinhard: float) -> np.ndarray:
    """Golden exposure + extended Reinhard (src/reproject.cpp:421-437)."""
    out = img.astype(F).copy()
    ch = min(img.shape[-1], 3)
    v = out[..., :ch] * F(exposure)
    out[..., :ch] = v * (F(1.0) + v / F(reinhard * reinhard)) / (F(1.0) + v)
    return out
