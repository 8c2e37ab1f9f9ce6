"""Stereographic fisheye (gap-fill extension) tests."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from image_lens_reproject_tpu import cli
from image_lens_reproject_tpu.models import projections as P
from image_lens_reproject_tpu.models.lens import FisheyeStereographic, Rectilinear, full_equirectangular
from image_lens_reproject_tpu.ops import remap
from image_lens_reproject_tpu.utils import config as C
from image_lens_reproject_tpu.utils import oracle

F = np.float32

STEREO = FisheyeStereographic(
    focal_length=15.0, fov=math.pi, sensor_width=36.0, sensor_height=36.0
)
W, H = 1920.0, 1080.0


def test_forward_model():
    # r_mm = 2 f tan(theta/2); theta = pi/2 -> r_mm = 2*15*1 = 30.
    r_px = F(30.0 / 36.0 * W)
    x, y, z = (np.asarray(v, dtype=np.float64) for v in P.stereographic_to_vec(STEREO, W, H, r_px, F(0.0), xp=np))
    np.testing.assert_allclose(z, 0.0, atol=1e-6)
    np.testing.assert_allclose(x, 1.0, atol=1e-6)


def test_inverse_model():
    theta = math.pi / 3
    x, y, z = F(math.sin(theta)), F(0.0), F(-math.cos(theta))
    cx, cy = P.vec_to_stereographic(STEREO, W, H, x, y, z, xp=np)
    r_mm = 2 * 15.0 * math.tan(theta / 2)
    np.testing.assert_allclose(float(cx), r_mm / 36.0 * W, rtol=1e-5)


def test_center_finite():
    x, y, z = P.stereographic_to_vec(STEREO, W, H, F(0.0), F(0.0), xp=np)
    assert np.isfinite(x) and float(z) == 1.0


def test_remap_matches_oracle():
    rng = np.random.default_rng(3)
    yy, xx = np.meshgrid(np.linspace(0, 1, 48, dtype=F), np.linspace(0, 1, 96, dtype=F), indexing="ij")
    src = np.stack([0.5 + 0.4 * np.sin(4 * xx + 3 * yy + k) for k in range(3)], axis=-1).astype(F)
    got = np.asarray(
        remap.remap_jit(
            jnp.asarray(src), None,
            in_lens=STEREO, out_lens=full_equirectangular(),
            out_h=32, out_w=64, interp="bilinear", n_samples=1,
        )
    )
    want = oracle.oracle_remap(
        src, None, in_lens=STEREO, out_lens=full_equirectangular(),
        out_h=32, out_w=64, interp="bilinear", n_samples=1,
    )
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_config_roundtrip():
    cfg = {"sensor_size": [0, 0], "resolution": [64, 64]}
    C.store_lens_info_in_config(STEREO, cfg)
    assert cfg["camera"]["panorama_type"] == "FISHEYE_STEREOGRAPHIC"
    back = C.extract_lens_info_from_config(cfg)
    assert back == STEREO


def test_cli_parser():
    lens = cli.parse_stereographic("15,36,3.14159", 1000, 500)
    assert lens.focal_length == 15.0 and lens.sensor_height == 18.0


def test_cli_end_to_end(tmp_path):
    from image_lens_reproject_tpu.io import png

    img = np.full((16, 16, 3), 0.5, dtype=F)
    png.write_png(str(tmp_path / "in.png"), img)
    rc = cli.main([
        "--single", str(tmp_path / "in.png"), "-o", str(tmp_path / "out"), "--png",
        "--no-configs", "16,16", "--i-stereographic", "15,36,3.14159",
        "--rectilinear", "35,36", "--bl",
    ])
    assert rc == 0
    assert (tmp_path / "out" / "in.png").exists()
