"""Closed-form and round-trip tests of the lens projection math.

Realises the intent of the reference's empty ``test_conversion_math``
(src/reproject.cpp:439-467): assert forward/inverse pairs against
closed-form values, *including* the reference's intentional quirks
(SURVEY.md §2.1) which the rebuild replicates for output parity.
"""

import math

import numpy as np
import pytest

from image_lens_reproject_tpu.models import projections as P
from image_lens_reproject_tpu.models.lens import (
    Equirectangular,
    FisheyeEquidistant,
    FisheyeEquisolid,
    Rectilinear,
    full_equirectangular,
)

F = np.float32


RECT = Rectilinear(focal_length=35.0, sensor_width=36.0, sensor_height=20.25)
EQUIDIST = FisheyeEquidistant(fov=math.pi, sensor_width=36.0, sensor_height=36.0)
EQUISOLID = FisheyeEquisolid(
    focal_length=15.0, fov=math.pi, sensor_width=36.0, sensor_height=36.0
)
EQUIRECT = full_equirectangular()

W, H = 1920.0, 1080.0


def as_np(t):
    return tuple(np.asarray(v, dtype=np.float64) for v in t)


class TestRectilinear:
    def test_center_ray(self):
        x, y, z = as_np(P.rectilinear_to_vec(RECT, W, H, F(0.0), F(0.0), xp=np))
        assert x == 0.0 and y == 0.0 and z == -1.0

    def test_edge_ray(self):
        # cx = w/2 -> x = 0.5 * sensor_w / f
        x, y, z = as_np(P.rectilinear_to_vec(RECT, W, H, F(W / 2), F(0.0), xp=np))
        np.testing.assert_allclose(x, 0.5 * 36.0 / 35.0, rtol=1e-6)
        assert z == -1.0

    def test_roundtrip_identity(self):
        cx = np.linspace(-W / 2, W / 2, 21, dtype=F)
        cy = np.linspace(-H / 2, H / 2, 21, dtype=F)
        x, y, z = P.rectilinear_to_vec(RECT, W, H, cx, cy, xp=np)
        cx2, cy2 = P.vec_to_rectilinear(RECT, W, H, x, y, z, xp=np)
        np.testing.assert_allclose(cx2, cx, atol=1e-3)
        np.testing.assert_allclose(cy2, cy, atol=1e-3)


class TestEquidistant:
    def test_90deg_ray(self):
        # fov=pi: r_px = w/2 -> theta = pi/2 -> ray (1, 0, 0)
        x, y, z = as_np(P.equidistant_to_vec(EQUIDIST, W, H, F(W / 2), F(0.0), xp=np))
        np.testing.assert_allclose(x, 1.0, atol=1e-6)
        np.testing.assert_allclose(z, 0.0, atol=1e-6)

    def test_z_is_positive_cos_theta_quirk(self):
        # Reference emits z=+cos(theta) (src/reproject.cpp:185) even though
        # rectilinear looks down -z. Guard the quirk stays replicated.
        x, y, z = as_np(P.equidistant_to_vec(EQUIDIST, W, H, F(10.0), F(0.0), xp=np))
        assert z > 0.99

    def test_roundtrip_is_point_flip_quirk(self):
        # Because forward emits z=+cos(theta) and the inverse divides by -z,
        # equidistant->equidistant round-trips to the NEGATED coordinate.
        cx = np.linspace(-W / 4, W / 4, 17, dtype=F)
        cy = np.zeros_like(cx)
        x, y, z = P.equidistant_to_vec(EQUIDIST, W, H, cx, cy, xp=np)
        cx2, cy2 = P.vec_to_equidistant(EQUIDIST, W, H, x, y, z, xp=np)
        np.testing.assert_allclose(cx2, -cx, atol=2e-3)

    def test_center_no_nan(self):
        x, y, z = as_np(P.equidistant_to_vec(EQUIDIST, W, H, F(0.0), F(0.0), xp=np))
        assert np.isfinite(x) and np.isfinite(y) and np.isfinite(z)
        assert z == 1.0


class TestEquisolid:
    def test_blender_model_forward(self):
        # r_mm = 2 f sin(theta/2): pick theta = pi/2
        theta = math.pi / 2
        r_mm = 2 * 15.0 * math.sin(theta / 2)
        r_px = F(r_mm / 36.0 * W)
        x, y, z = as_np(P.equisolid_to_vec(EQUISOLID, W, H, r_px, F(0.0), xp=np))
        np.testing.assert_allclose(z, math.cos(theta), atol=1e-5)
        np.testing.assert_allclose(x, math.sin(theta), atol=1e-5)

    def test_inverse_matches_model(self):
        # theta = pi/4 ray (z<0 after the -z divide convention)
        theta = math.pi / 4
        x, y, z = F(math.sin(theta)), F(0.0), F(-math.cos(theta))
        cx, cy = as_np(P.vec_to_equisolid(EQUISOLID, W, H, x, y, z, xp=np))
        r_mm = 2 * 15.0 * math.sin(theta / 2)
        np.testing.assert_allclose(cx, r_mm / 36.0 * W, rtol=1e-5)
        assert cy == 0.0

    def test_center_no_nan(self):
        x, y, z = as_np(P.equisolid_to_vec(EQUISOLID, W, H, F(0.0), F(0.0), xp=np))
        assert np.isfinite(x) and z == 1.0

    def test_asin_clamped_outside_circle(self):
        # Corner pixel beyond the physical lens circle must not produce NaN.
        x, y, z = as_np(
            P.equisolid_to_vec(EQUISOLID, W, H, F(W * 2.0), F(H * 2.0), xp=np)
        )
        assert np.isfinite(x) and np.isfinite(y) and np.isfinite(z)


class TestEquirectangular:
    def test_center_is_minus_z(self):
        x, y, z = as_np(P.equirectangular_to_vec(EQUIRECT, W, H, F(0.0), F(0.0), xp=np))
        np.testing.assert_allclose([x, y, z], [0.0, 0.0, -1.0], atol=1e-6)

    def test_not_unit_vector_quirk(self):
        # Reference omits cos(latitude) horizontal scaling
        # (src/reproject.cpp:254-256): |v| != 1 off the equator.
        x, y, z = as_np(
            P.equirectangular_to_vec(EQUIRECT, W, H, F(0.0), F(H / 4), xp=np)
        )
        n = math.sqrt(x * x + y * y + z * z)
        assert abs(n - 1.0) > 0.05

    def test_horizontal_roundtrip_identity(self):
        cx = np.linspace(-W / 2 + 1, W / 2 - 1, 31, dtype=F)
        cy = np.zeros_like(cx)
        x, y, z = P.equirectangular_to_vec(EQUIRECT, W, H, cx, cy, xp=np)
        cx2, cy2 = P.vec_to_equirectangular(EQUIRECT, W, H, x, y, z, xp=np)
        np.testing.assert_allclose(cx2, cx, atol=1e-2)
        np.testing.assert_allclose(cy2, cy, atol=1e-2)

    def test_vertical_roundtrip_is_atan_sin_quirk(self):
        # phi_out = asin(sin(lat)/|v|) = atan(sin(lat)): the vertical
        # round-trip compresses latitudes (reference quirk, SURVEY.md §2.1).
        lat = 0.8
        cy = F((lat / math.pi) * H)  # full pano: lat_span = pi
        x, y, z = P.equirectangular_to_vec(EQUIRECT, W, H, F(0.0), cy, xp=np)
        cx2, cy2 = P.vec_to_equirectangular(EQUIRECT, W, H, x, y, z, xp=np)
        expected_lat = math.atan(math.sin(lat))
        np.testing.assert_allclose(
            float(cy2), (expected_lat / math.pi) * H, atol=0.51
        )

    def test_partial_pano_not_wrapping(self):
        part = Equirectangular(
            longitude_min=-1.0, longitude_max=1.0, latitude_min=-0.5, latitude_max=0.5
        )
        assert not part.is_full_360()
        assert EQUIRECT.is_full_360()


class TestDispatch:
    def test_unknown_type_raises(self):
        class Weird:
            pass

        with pytest.raises(ValueError, match="not supported"):
            P.target_to_vec(Weird(), W, H, F(0.0), F(0.0), xp=np)
        with pytest.raises(ValueError, match="not supported"):
            P.vec_to_source(Weird(), W, H, F(0.0), F(0.0), F(-1.0), xp=np)

    def test_jnp_matches_numpy(self):
        import jax.numpy as jnp

        cx = np.linspace(-W / 2, W / 2, 64, dtype=F)
        cy = np.linspace(-H / 2, H / 2, 64, dtype=F)
        for lens in (RECT, EQUIDIST, EQUISOLID, EQUIRECT):
            xn, yn, zn = P.target_to_vec(lens, W, H, cx, cy, xp=np)
            xj, yj, zj = P.target_to_vec(lens, W, H, jnp.asarray(cx), jnp.asarray(cy))
            np.testing.assert_allclose(np.asarray(xj), xn, atol=1e-5)
            np.testing.assert_allclose(np.asarray(yj), yn, atol=1e-5)
            np.testing.assert_allclose(np.asarray(zj), zn, atol=1e-5)
