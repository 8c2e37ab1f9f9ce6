"""Package vs the implementation-independent C++ port (tests/reference_port.py).

These tests fail if anyone "fixes" a reference quirk in the package's
formula modules — the port shares NO code with models/projections.py,
ops/sampling.py, or models/rotation.py. Five BASELINE-shaped configs at
small sizes (scalar port is slow), plus quirk-pinning spot checks.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import reference_port as ref

from image_lens_reproject_tpu.models.lens import (
    Equirectangular,
    FisheyeEquidistant,
    FisheyeEquisolid,
    Rectilinear,
    full_equirectangular,
)
from image_lens_reproject_tpu.models.rotation import rotation_matrix_degrees
from image_lens_reproject_tpu.ops import color, remap

F = np.float32


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


def run_package(src, in_lens, out_lens, oh, ow, interp, n, rot_np=None,
                exposure=1.0, reinhard=1.0):
    rot = None if rot_np is None else jnp.asarray(rot_np)
    out = remap.remap_image(
        jnp.asarray(src), rot, in_lens=in_lens, out_lens=out_lens,
        out_h=oh, out_w=ow, interp=interp, n_samples=n,
    )
    if exposure != 1.0 or reinhard != 1.0:
        out = color.post_process(out, exposure, reinhard)
    return np.asarray(out)


# The port uses numpy's libm and true-Horner bicubic; the package uses
# XLA transcendentals and weight-expanded bicubic — identical formulas,
# different rounding. Budget well below the 1e-3 parity bar but far above
# f32 noise; a "fixed" quirk shifts outputs by orders of magnitude more.
ATOL = 2e-4


class TestBaselineConfigs:
    def test_cfg1_equidistant_to_rect_bilinear(self):
        src = smooth(32, 32, 3, seed=1)
        in_l = ref.equidistant(180.0)  # raw atof passthrough: 180 radians
        out_l = ref.rectilinear(35.0, 36.0, 36.0)
        want = ref.reproject(src, in_l, out_l, 32, 32, 1, "bilinear")
        got = run_package(
            src,
            FisheyeEquidistant(fov=180.0, sensor_width=36.0, sensor_height=36.0),
            Rectilinear(35.0, 36.0, 36.0), 32, 32, "bilinear", 1,
        )
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_cfg2_equisolid_to_full_equirect_rotated(self):
        src = smooth(32, 32, 3, seed=2)
        rot_ref = ref.rotation_matrix(30.0, 10.0, 5.0)
        rot_pkg = rotation_matrix_degrees(30.0, 10.0, 5.0)
        np.testing.assert_allclose(rot_pkg, rot_ref, atol=1e-6)
        in_l = ref.equisolid(15.0, math.pi, 36.0, 36.0)
        out_l = ref.full_equirect()
        want = ref.reproject(src, in_l, out_l, 16, 32, 1, "bilinear",
                             rotation=rot_ref)
        got = run_package(
            src, FisheyeEquisolid(15.0, math.pi, 36.0, 36.0),
            full_equirectangular(), 16, 32, "bilinear", 1, rot_np=rot_ref,
        )
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_cfg3_equirect_to_rect_bicubic_tonemapped(self):
        # Wrap path (full-360 input) + exposure + Reinhard.
        src = smooth(16, 32, 3, seed=3) * 2.0
        in_l = ref.full_equirect()
        out_l = ref.rectilinear(35.0, 36.0, 20.25)
        want = ref.post_process(
            ref.reproject(src, in_l, out_l, 24, 32, 1, "bicubic"), 2.0, 4.0
        )
        got = run_package(
            src, full_equirectangular(), Rectilinear(35.0, 36.0, 20.25),
            24, 32, "bicubic", 1, exposure=2.0, reinhard=4.0,
        )
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_cfg4_rect_to_equisolid_rgbz(self):
        src = smooth(32, 32, 4, seed=4)
        in_l = ref.rectilinear(50.0, 36.0, 36.0)
        out_l = ref.equisolid(15.0, math.pi, 36.0, 36.0)
        want = ref.reproject(src, in_l, out_l, 32, 32, 1, "bilinear")
        got = run_package(
            src, Rectilinear(50.0, 36.0, 36.0),
            FisheyeEquisolid(15.0, math.pi, 36.0, 36.0), 32, 32, "bilinear", 1,
        )
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_cfg5_supersampled_nearest(self):
        # Directory-config compute shape: supersampling + nearest.
        src = smooth(24, 24, 3, seed=5)
        in_l = ref.equidistant(math.pi)
        out_l = ref.rectilinear(35.0, 36.0, 36.0)
        want = ref.reproject(src, in_l, out_l, 24, 24, 2, "nearest")
        got = run_package(
            src, FisheyeEquidistant(math.pi, 36.0, 36.0),
            Rectilinear(35.0, 36.0, 36.0), 24, 24, "nearest", 2,
        )
        np.testing.assert_allclose(got, want, atol=ATOL)


class TestQuirkPins:
    """Direct quirk assertions against the independent port — these are the
    values someone "fixing" the geometry would change."""

    def test_equidistant_forward_z_is_plus_cos(self):
        lens = ref.equidistant(math.pi)
        # theta > pi/2 -> cos negative; the quirk keeps z = +cos(theta).
        x, y, z = ref._target_to_vec(lens, F(32), F(32), F(14.0), F(0.0))
        theta = 14.0 / 32.0 * math.pi
        assert z == pytest.approx(math.cos(theta), abs=1e-6)

    def test_equirect_ray_not_unit(self):
        lens = ref.full_equirect()
        # 60 deg latitude: |v| = sqrt(1 + sin^2(lat)) != 1 (no cos factor).
        x, y, z = ref._target_to_vec(lens, F(360), F(180), F(0.0), F(60.0))
        n = math.sqrt(float(x * x + y * y + z * z))
        assert n == pytest.approx(math.sqrt(1 + math.sin(math.radians(60)) ** 2), abs=1e-5)

    def test_rect_inverse_mirrors_behind_camera(self):
        lens = ref.rectilinear(35.0, 36.0, 36.0)
        cx_f, cy_f = ref._vec_to_source(lens, F(32), F(32), F(0.1), F(0.0), F(-1.0))
        cx_b, cy_b = ref._vec_to_source(lens, F(32), F(32), F(0.1), F(0.0), F(1.0))
        assert cx_b == pytest.approx(-float(cx_f), rel=1e-6)

    def test_sampling_truncates_toward_zero(self):
        img = np.arange(12, dtype=F).reshape(1, 4, 3) * 0 + \
            np.arange(4, dtype=F)[None, :, None]
        # sx = -0.4: int() truncation gives tap 0 (floor would give -1->clamp 0
        # too, but the fraction differs: fx = clip(-0.4 - 0, 0, 1) = 0).
        v = ref._sample_bilinear(img, 4, 1, 3, F(-0.4), F(0.0), False)
        assert v[0] == pytest.approx(0.0)  # fraction clamps to the low tap
