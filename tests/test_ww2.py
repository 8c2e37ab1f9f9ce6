"""Tests for the two-step-gather whole-window body (ops/pallas/ww2.py).

The ww2 body (scan_unroll <= -(_WW2_BASE+1)) must be indistinguishable
from the verified row-loop whole-window body wherever the prepass
admits it, and fall back to the exact patch path where its
consecutive-tap / spread<=1 contract fails (reference parity:
/root/reference/src/reproject.cpp:37-271 via ops/remap.py).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from image_lens_reproject_tpu.models.lens import (
    FisheyeEquidistant,
    FisheyeEquisolid,
    Rectilinear,
    full_equirectangular,
)
from image_lens_reproject_tpu.models.rotation import rotation_matrix_degrees
from image_lens_reproject_tpu.ops import remap
from image_lens_reproject_tpu.ops.pallas import remap_kernel as RK

EQ = full_equirectangular()
RECT = Rectilinear(35.0, 36.0, 36.0)


@pytest.fixture(autouse=True)
def _interpret():
    RK.set_interpret(True)
    yield
    RK.set_interpret(False)


def _src(h, w, c=3, seed=3):
    return np.random.default_rng(seed).uniform(0, 2, (h, w, c)).astype(
        np.float32)


def test_resolve_su_encoding():
    assert RK._resolve_su(-1, 3) == ((128) // 3, 1, False)
    assert RK._resolve_su(-(RK._WW2_BASE + 2), 3) == ((2 * 128) // 3, 2, True)
    assert RK._resolve_su(32, 3) == (32, 0, False)


def test_ww2_bitwise_equals_row_loop_body():
    src = _src(512, 512)
    rot = jnp.asarray(rotation_matrix_degrees(20.0, 5.0, 0.0))
    kw = dict(in_lens=EQ, out_lens=RECT, out_h=256, out_w=256,
              interp="bicubic", tile_rows=32, n_groups=1, rb=16)
    a = np.asarray(RK.remap_pallas(jnp.asarray(src), rot,
                                   scan_unroll=-(RK._WW2_BASE + 1), **kw))
    b = np.asarray(RK.remap_pallas(jnp.asarray(src), rot,
                                   scan_unroll=-1, **kw))
    assert np.array_equal(a, b)


@pytest.mark.parametrize("interp,g", [("bilinear", 2), ("nearest", 1)])
def test_ww2_oracle_parity(interp, g):
    src = _src(512, 512)
    out = RK.remap_pallas(
        jnp.asarray(src), None, in_lens=FisheyeEquidistant(math.pi, 36., 36.),
        out_lens=RECT, out_h=256, out_w=512, interp=interp, tile_rows=16,
        n_groups=1, rb=16 if g == 1 else 40,
        scan_unroll=-(RK._WW2_BASE + g))
    want = remap.remap_image(
        src, None, in_lens=FisheyeEquidistant(math.pi, 36., 36.),
        out_lens=RECT, out_h=256, out_w=512, interp=interp, n_samples=1)
    err = np.abs(np.asarray(out) - np.asarray(want))
    assert float(np.quantile(err, 0.999)) < 1e-4


def test_ww2_seam_and_supersample():
    src = _src(256, 512)
    rot = jnp.asarray(rotation_matrix_degrees(180.0, 0.0, 0.0))
    out = RK.remap_pallas(
        jnp.asarray(src), rot, in_lens=EQ, out_lens=RECT,
        out_h=128, out_w=256, interp="bilinear", tile_rows=16, n_groups=1,
        rb=16, scan_unroll=-(RK._WW2_BASE + 1), n_samples=2)
    want = remap.remap_image(src, np.asarray(rot), in_lens=EQ, out_lens=RECT,
                             out_h=128, out_w=256, interp="bilinear",
                             n_samples=2)
    err = np.abs(np.asarray(out) - np.asarray(want))
    assert float(np.quantile(err, 0.999)) < 1e-4


def test_ww2_admission_rejects_spread_violations():
    """A steep polar-arc config (cfg2 geometry) violates spread<=1 on
    ~half its sub-tiles; ww2 must still be exact end-to-end because the
    prepass rejects those sub-tiles into the patch path."""
    src = _src(256, 256)
    rot = jnp.asarray(rotation_matrix_degrees(30.0, 10.0, 5.0))
    il = FisheyeEquisolid(15.0, math.pi, 36.0, 36.0)
    out = RK.remap_pallas(
        jnp.asarray(src), rot, in_lens=il, out_lens=EQ,
        out_h=128, out_w=256, interp="bilinear", tile_rows=16, n_groups=2,
        rb=40, scan_unroll=-(RK._WW2_BASE + 2))
    want = remap.remap_image(src, np.asarray(rot), in_lens=il, out_lens=EQ,
                             out_h=128, out_w=256, interp="bilinear",
                             n_samples=1)
    err = np.abs(np.asarray(out) - np.asarray(want))
    assert float(np.quantile(err, 0.999)) < 1e-4
    # and the ww2 prepass must actually be stricter than the row-loop's
    pre2 = RK.make_prepass(
        jnp.asarray(rot), in_lens=il, out_lens=EQ, in_h=256, in_w=256,
        out_h=128, out_w=256, interp="bilinear", tile_rows=16, n_groups=2,
        rb=40, scan_unroll=-(RK._WW2_BASE + 2))
    pre1 = RK.make_prepass(
        jnp.asarray(rot), in_lens=il, out_lens=EQ, in_h=256, in_w=256,
        out_h=128, out_w=256, interp="bilinear", tile_rows=16, n_groups=2,
        rb=40, scan_unroll=-2)
    bad2 = int(np.asarray(jnp.sum(pre2[1])))
    bad1 = int(np.asarray(jnp.sum(pre1[1])))
    assert bad2 >= bad1
    assert bad2 > 0
