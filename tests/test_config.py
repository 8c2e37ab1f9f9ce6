"""Blender JSON config extract/store/round-trip tests (src/config.cpp)."""

import json
import math

import pytest

from image_lens_reproject_tpu.models.lens import (
    Equirectangular,
    FisheyeEquidistant,
    FisheyeEquisolid,
    Rectilinear,
)
from image_lens_reproject_tpu.utils import config as C


def blender_cfg(camera, sensor=(36.0, 24.0), resolution=(1920, 1080), **extra):
    cfg = {
        "camera": camera,
        "sensor_size": list(sensor),
        "resolution": list(resolution),
        "clip_start": 0.1,  # unknown keys must pass through
        "custom_blob": {"a": [1, 2, 3]},
    }
    cfg.update(extra)
    return cfg


class TestExtract:
    def test_persp_millimeters(self):
        cfg = blender_cfg({"type": "PERSP", "lens_unit": "MILLIMETERS", "focal_length": 50.0})
        lens = C.extract_lens_info_from_config(cfg)
        assert isinstance(lens, Rectilinear)
        assert lens.focal_length == 50.0
        assert lens.sensor_width == 36.0 and lens.sensor_height == 24.0

    def test_persp_fov(self, capsys):
        angle = 1.2
        cfg = blender_cfg({"type": "PERSP", "lens_unit": "FOV", "angle": angle})
        lens = C.extract_lens_info_from_config(cfg)
        assert math.isclose(lens.focal_length, 36.0 / math.tan(0.5 * angle), rel_tol=1e-9)

    def test_pano_equidistant(self):
        cfg = blender_cfg({"type": "PANO", "panorama_type": "FISHEYE_EQUIDISTANT", "fisheye_fov": math.pi})
        lens = C.extract_lens_info_from_config(cfg)
        assert isinstance(lens, FisheyeEquidistant)
        assert lens.fov == math.pi

    def test_pano_equisolid(self):
        cfg = blender_cfg({"type": "PANO", "panorama_type": "FISHEYE_EQUISOLID", "fisheye_lens": 15.0, "fisheye_fov": math.pi})
        lens = C.extract_lens_info_from_config(cfg)
        assert isinstance(lens, FisheyeEquisolid)
        assert lens.focal_length == 15.0 and lens.fov == math.pi

    def test_pano_equirectangular(self):
        cam = {
            "type": "PANO", "panorama_type": "EQUIRECTANGULAR",
            "latitude_min": -1.0, "latitude_max": 1.0,
            "longitude_min": -2.0, "longitude_max": 2.0,
        }
        lens = C.extract_lens_info_from_config(blender_cfg(cam))
        assert isinstance(lens, Equirectangular)
        assert lens.longitude_span == 4.0

    def test_unknown_camera_type_raises(self):
        with pytest.raises(ValueError, match="Unknown camera_type"):
            C.extract_lens_info_from_config(blender_cfg({"type": "ORTHO"}))

    def test_unknown_lens_unit_raises(self):
        with pytest.raises(ValueError, match="Unknown lens_unit"):
            C.extract_lens_info_from_config(
                blender_cfg({"type": "PERSP", "lens_unit": "FURLONGS"})
            )


class TestStore:
    def test_rectilinear_projection_matrix(self):
        lens = Rectilinear(focal_length=50.0, sensor_width=36.0, sensor_height=24.0)
        cfg = {}
        C.store_lens_info_in_config(lens, cfg)
        cam = cfg["camera"]
        assert cam["type"] == "PERSP" and cam["lens_unit"] == "MILLIMETERS"
        proj = cam["projection_matrix"]
        assert proj[0][0] == pytest.approx(2 * 50.0 / 36.0)
        assert proj[1][1] == pytest.approx(2 * 50.0 / 24.0)
        near, far = 0.1, 100.0
        assert proj[2][2] == pytest.approx(-(far + near) / (far - near))
        assert proj[2][3] == pytest.approx(-2 * far * near / (far - near))
        assert proj[3][2] == -1.0

    def test_equirect_stores_rectilinear_quirk(self):
        # Reference quirk src/config.cpp:98 — replicated for config parity.
        lens = Equirectangular(-math.pi, math.pi, -1.0, 1.0)
        cfg = {}
        C.store_lens_info_in_config(lens, cfg)
        assert cfg["camera"]["panorama_type"] == "RECTILINEAR"
        assert cfg["camera"]["longitude_max"] == math.pi

    def test_equisolid_roundtrip(self):
        lens = FisheyeEquisolid(15.0, math.pi, 36.0, 36.0)
        cfg = {"sensor_size": [0, 0], "resolution": [100, 100]}
        C.store_lens_info_in_config(lens, cfg)
        back = C.extract_lens_info_from_config(cfg)
        assert back == lens

    def test_unknown_keys_preserved(self):
        cfg = blender_cfg({"type": "PERSP", "lens_unit": "MILLIMETERS", "focal_length": 50.0})
        lens = C.extract_lens_info_from_config(cfg)
        out = dict(cfg)
        C.store_lens_info_in_config(lens, out)
        assert out["clip_start"] == 0.1
        assert out["custom_blob"] == {"a": [1, 2, 3]}


class TestFrameFilter:
    def test_prefix_suffix(self):
        cfg = {"frames": [{"name": n} for n in ["cam0_a.exr", "cam1_b.exr", "cam0_c.png"]]}
        C.filter_frames(cfg, "cam0", ".exr")
        assert [f["name"] for f in cfg["frames"]] == ["cam0_a.exr"]

    def test_no_frames_ok(self):
        cfg = {}
        C.filter_frames(cfg, "x", "y")
        assert cfg == {}

    def test_short_names_removed(self):
        cfg = {"frames": [{"name": "ab"}]}
        C.filter_frames(cfg, "abcdef", "")
        assert cfg["frames"] == []


class TestSaveLoad:
    def test_roundtrip_file(self, tmp_path):
        cfg = blender_cfg({"type": "PERSP", "lens_unit": "MILLIMETERS", "focal_length": 35.0})
        path = str(tmp_path / "cfg.json")
        C.save_config(path, cfg)
        back = C.load_config(path)
        assert back == cfg
        with open(path) as f:
            text = f.read()
        assert text == json.dumps(cfg, indent=2)  # dump(2) parity


def test_equisolid_readme_lens_key():
    # The reference README's equisolid template uses "lens" while the code
    # reads "fisheye_lens" (src/config.cpp:26 vs README.md) — accept both.
    import math
    from image_lens_reproject_tpu.utils.config import extract_lens_info_from_config
    from image_lens_reproject_tpu.models.lens import FisheyeEquisolid

    cfg = {
        "camera": {
            "type": "PANO",
            "panorama_type": "FISHEYE_EQUISOLID",
            "lens": 12.5,
            "fisheye_fov": 3.1415927410125732,
        },
        "resolution": [256, 256],
        "sensor_size": [36.0, 36.0],
    }
    lens = extract_lens_info_from_config(cfg)
    assert isinstance(lens, FisheyeEquisolid)
    assert lens.focal_length == 12.5
    # code key wins when both present
    cfg["camera"]["fisheye_lens"] = 15.0
    assert extract_lens_info_from_config(cfg).focal_length == 15.0


def test_equirect_store_quirk_roundtrips():
    # Our store replicates the reference quirk (panorama_type "RECTILINEAR"
    # for equirect, src/config.cpp:98); unlike the reference — which cannot
    # re-read its own output — our extractor accepts it via the lat/long
    # keys, so chained reprojections work.
    import math
    from image_lens_reproject_tpu.utils.config import (
        extract_lens_info_from_config, store_lens_info_in_config,
    )
    from image_lens_reproject_tpu.models.lens import Equirectangular

    lens = Equirectangular(-math.pi, math.pi, -1.0, 1.0)
    cfg = {"resolution": [64, 32], "sensor_size": [0.0, 0.0]}
    store_lens_info_in_config(lens, cfg)
    assert cfg["camera"]["panorama_type"] == "RECTILINEAR"  # the quirk
    back = extract_lens_info_from_config(cfg)
    assert isinstance(back, Equirectangular)
    assert back.longitude_min == lens.longitude_min
    assert back.latitude_max == lens.latitude_max
