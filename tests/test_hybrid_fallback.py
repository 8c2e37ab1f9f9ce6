"""Hybrid per-tile fallback tests (interpret mode).

Configs whose window-overflow tiles are a small fraction of the frame
must run the kernel everywhere and patch just the bad tiles with exact
XLA-sampled values — outputs identical to the pure-XLA path either way.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from image_lens_reproject_tpu.models.lens import (
    FisheyeEquisolid,
    Rectilinear,
    full_equirectangular,
)
from image_lens_reproject_tpu.ops import remap
from image_lens_reproject_tpu.ops.pallas import remap_kernel as RK

F = np.float32


@pytest.fixture(autouse=True)
def interpret_mode():
    RK.set_interpret(True)
    yield
    RK.set_interpret(False)


def smooth(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(
        np.linspace(0, 1, h, dtype=F), np.linspace(0, 1, w, dtype=F), indexing="ij"
    )
    return np.stack(
        [0.5 + 0.45 * np.sin(4 * a * xx + 3 * b * yy + p)
         for a, b, p in rng.uniform(0.5, 2, (c, 3))],
        -1,
    ).astype(F)


def test_partial_overflow_is_patched_exactly():
    # rect -> equisolid: tiles crossing the fisheye-circle edge overflow
    # (the rectilinear inverse blows up toward the 180° ring) while the
    # interior stays kernel-eligible.
    RECT = Rectilinear(18.0, 36.0, 36.0)  # wide-angle: strong edge stretch
    EQUISOLID = FisheyeEquisolid(15.0, math.pi, 36.0, 36.0)
    src = jnp.asarray(smooth(128, 128, 3, seed=1))

    out, clean = RK._remap_pallas_one(
        src, None, in_lens=RECT, out_lens=EQUISOLID,
        out_h=128, out_w=256, interp="bilinear", off_x=0.0, off_y=0.0,
    )
    want = np.asarray(
        remap.remap_image(
            src, None, in_lens=RECT, out_lens=EQUISOLID,
            out_h=128, out_w=256, interp="bilinear", n_samples=1,
        )
    )
    err = np.abs(np.asarray(out) - want)
    assert np.quantile(err, 0.999) < 1e-4
    assert err.max() < 1e-3


def test_bad_tile_accounting():
    # Same config: confirm the prepass actually marks a nonzero, sub-cap
    # set of bad tiles (i.e., the patch path is what ran above).
    RECT = Rectilinear(18.0, 36.0, 36.0)
    EQUISOLID = FisheyeEquisolid(15.0, math.pi, 36.0, 36.0)
    in_h = in_w = 128
    out_h, out_w = 128, 256
    tile_rows, ng = 8, 3
    n_ty, n_tx = -(-out_h // tile_rows), -(-out_w // RK.TC)
    src_chw = jnp.zeros((3, in_h, in_w), jnp.float32)
    padded, h_pad, w_pad = RK._pad_source(src_chw, False)
    n_rp, n_cp = h_pad // RK.RB - 1, w_pad // RK.CB - 1
    _, bad = RK._prepass(
        RECT, EQUISOLID, in_h, in_w, out_h, out_w,
        None, ((0.0, 0.0),), "bilinear", False, n_ty, n_tx, n_rp, n_cp,
        tile_rows, ng,
    )
    n_bad = int(np.asarray(bad).sum())  # bad is per 8-row sub-tile
    assert 0 < n_bad <= (n_ty * (tile_rows // 8) * n_tx)  # overflow ring exists


def test_image_roundtrip_property():
    # SURVEY.md §4(3): A -> B -> A is near-identity away from edges
    # (interpolation blur bounded on smooth content).
    EQUIRECT = full_equirectangular()
    RECT = Rectilinear(20.0, 36.0, 27.0)
    src = smooth(96, 192, 3, seed=5)
    fwd = remap.remap_image(
        jnp.asarray(src), None, in_lens=EQUIRECT, out_lens=RECT,
        out_h=192, out_w=256, interp="bilinear", n_samples=1,
    )
    back = np.asarray(
        remap.remap_image(
            fwd, None, in_lens=RECT, out_lens=EQUIRECT,
            out_h=96, out_w=192, interp="bilinear", n_samples=1,
        )
    )
    # Compare only the region the rectilinear FOV covers (center band).
    region = (slice(36, 60), slice(80, 112))
    err = np.abs(back[region] - src[region])
    assert err.max() < 0.05
