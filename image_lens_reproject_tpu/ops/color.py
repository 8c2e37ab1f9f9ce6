"""Color post-processing: exposure compensation + extended Reinhard tonemap.

Reference: src/reproject.cpp:421-437 (``post_process``). Applied in-place
per pixel on at most the first 3 channels (alpha / depth are untouched,
``min(channels, 3)``); here it is a pure fused elementwise op that XLA
folds into the remap program when both run on device.

The exposure argument is a *linear* multiplier; the CLI converts stops to
linear via 2^EV (reference src/main.cpp:327). The tonemap is extended
Reinhard: v' = v (1 + v / max²) / (1 + v) with ``max`` the --reinhard
white point (src/reproject.cpp:430).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

Array = Any


def post_process(img: Array, exposure: float, reinhard: float, xp=jnp) -> Array:
    """Apply exposure + extended Reinhard to the first min(C, 3) channels.

    ``img``: (..., C) float32. Returns a new array (pure). Callers skip
    the call entirely when exposure == 1 and reinhard == 1, matching the
    reference's guard (src/main.cpp:601-603).
    """
    ch = min(int(img.shape[-1]), 3)
    rgb = img[..., :ch]
    v = rgb * xp.float32(exposure)
    inv_max2 = xp.float32(1.0 / (reinhard * reinhard))
    v = v * (xp.float32(1.0) + v * inv_max2) / (xp.float32(1.0) + v)
    if ch == img.shape[-1]:
        return v
    return xp.concatenate([v, img[..., ch:]], axis=-1)


@functools.partial(jax.jit, static_argnames=("exposure", "reinhard"))
def post_process_jit(img: jax.Array, *, exposure: float, reinhard: float) -> jax.Array:
    return post_process(img, exposure, reinhard, xp=jnp)
