"""In-kernel math for Pallas TPU: inverse trigonometry + an xp shim.

Mosaic (the Pallas TPU lowering) has no atan / atan2 / asin primitives, so
the lens projection math cannot call jnp.arctan* inside a kernel. These are
float32 minimax-polynomial implementations (standard Cephes-style
range-reduction formulas, max error ~1e-7 — far below the framework's 1e-3
output parity budget and the sub-pixel coordinate tolerance).

``KXP`` is a drop-in ``xp`` namespace for models/projections.py: the three
inverse-trig functions resolve to the kernel-safe versions, everything else
falls through to jnp — so the *same* projection code runs in XLA, numpy
(oracle) and inside Pallas kernels.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_F = jnp.float32

_HALF_PI = float(np.pi / 2)
_PI = float(np.pi)


_TAN_PI_8 = 0.4142135623730950  # tan(pi/8)
_TAN_3PI_8 = 2.414213562373095  # tan(3pi/8)
_QUARTER_PI = float(np.pi / 4)


def atan_f32(x):
    """arctan for float32 arrays (Cephes atanf three-range minimax, branch-free)."""
    sign = jnp.where(x < 0, _F(-1.0), _F(1.0))
    a = jnp.abs(x)
    hi = a > _F(_TAN_3PI_8)
    mid = jnp.logical_and(~hi, a > _F(_TAN_PI_8))
    safe_a = jnp.maximum(a, _F(1e-30))
    z = jnp.where(
        hi,
        _F(-1.0) / safe_a,
        jnp.where(mid, (a - _F(1.0)) / (a + _F(1.0)), a),
    )
    base = jnp.where(hi, _F(_HALF_PI), jnp.where(mid, _F(_QUARTER_PI), _F(0.0)))
    z2 = z * z
    p = _F(8.05374449538e-2)
    p = p * z2 - _F(1.38776856032e-1)
    p = p * z2 + _F(1.99777106478e-1)
    p = p * z2 - _F(3.33329491539e-1)
    r = base + (z + z * z2 * p)
    return sign * r


def atan2_f32(y, x):
    """arctan2 for float32 arrays, matching libm quadrant/zero conventions.

    Uses signbit (not comparison) for the sign of y so that -0.0 maps to
    the negative branch exactly as C's atan2 does — the equirectangular
    inverse projection (-atan2(-x, -z)) is sensitive to this at the seam.
    """
    ysign = jnp.where(jnp.signbit(y), _F(-1.0), _F(1.0))
    safe_x = jnp.where(x == 0, _F(1.0), x)
    base = atan_f32(y / safe_x)
    quad = jnp.where(
        x > 0,
        base,
        jnp.where(x < 0, base + ysign * _F(_PI), ysign * _F(_HALF_PI)),
    )
    # x == 0 handled by the final where above (ysign * pi/2); x==0,y==0 -> 0
    quad = jnp.where((x == 0) & (y == 0), _F(0.0), quad)
    return quad


def asin_f32(x):
    """arcsin for float32 arrays (Cephes asinf: poly + half-angle)."""
    sign = jnp.where(x < 0, _F(-1.0), _F(1.0))
    a = jnp.clip(jnp.abs(x), _F(0.0), _F(1.0))
    big = a > _F(0.5)
    z_big = _F(0.5) * (_F(1.0) - a)
    x_big = jnp.sqrt(z_big)
    z_small = a * a
    z = jnp.where(big, z_big, z_small)
    xx = jnp.where(big, x_big, a)
    p = _F(4.2163199048e-2)
    p = p * z + _F(2.4181311049e-2)
    p = p * z + _F(4.5470025998e-2)
    p = p * z + _F(7.4953002686e-2)
    p = p * z + _F(1.6666752422e-1)
    r = xx + xx * z * p
    r = jnp.where(big, _F(_HALF_PI) - _F(2.0) * r, r)
    return sign * r


class _KernelXP:
    """jnp facade with Mosaic-safe inverse trig (for projections' xp arg)."""

    arctan = staticmethod(atan_f32)
    arctan2 = staticmethod(atan2_f32)
    arcsin = staticmethod(asin_f32)

    def __getattr__(self, name):
        return getattr(jnp, name)


kxp = _KernelXP()
