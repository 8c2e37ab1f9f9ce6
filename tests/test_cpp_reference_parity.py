"""Pixel parity against the ACTUAL compiled C++ reference.

Builds /root/reference/src/reproject.cpp verbatim (bench/reference_cpu,
stub Tracy/json headers) and compares this framework's XLA remap output
with the real hot loop — a stronger oracle than the Python transcription
in tests/reference_port.py, because nothing was re-derived by hand.

Skipped when g++ or /root/reference is unavailable.
"""

import math
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/src/reproject.cpp")
BENCH_DIR = Path(__file__).resolve().parent.parent / "bench" / "reference_cpu"

pytestmark = pytest.mark.skipif(
    not REF.exists() or shutil.which("g++") is None,
    reason="reference sources or g++ unavailable",
)


@pytest.fixture(scope="module")
def ref_dump():
    exe = BENCH_DIR / "build" / "ref_dump"
    if not exe.exists():
        subprocess.run(["sh", str(BENCH_DIR / "build.sh")], check=True,
                       capture_output=True)
    return exe


def smooth(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(
        np.linspace(0, 1, h, dtype=np.float32),
        np.linspace(0, 1, w, dtype=np.float32), indexing="ij",
    )
    return np.stack(
        [0.5 + 0.45 * np.sin(4 * a * xx + 3 * b * yy + p)
         for a, b, p in rng.uniform(0.5, 2, (c, 3))], -1,
    ).astype(np.float32)


def run_ref(exe, tmp, src, in_lens_s, out_lens_s, out_h, out_w, interp,
            n_samples=1, rot=(0.0, 0.0, 0.0), exposure=1.0, reinhard=1.0):
    in_p = tmp / "in.bin"
    out_p = tmp / "out.bin"
    src.tofile(in_p)
    h, w, c = src.shape
    subprocess.run(
        [str(exe), str(in_p), str(out_p), in_lens_s, out_lens_s,
         str(w), str(h), str(out_w), str(out_h), str(c), interp,
         str(n_samples), str(rot[0]), str(rot[1]), str(rot[2]),
         str(exposure), str(reinhard)],
        check=True,
    )
    return np.fromfile(out_p, dtype=np.float32).reshape(out_h, out_w, c)


CASES = [
    # (name, in_lens_str, our in_lens factory, out_lens_str, our factory,
    #  interp, n_samples, rot, exposure, reinhard)
    ("equidist->rect bl",
     "equidist:{pi},36,36".format(pi=math.pi), "equidist",
     "rect:35,36,27", "rect", "bl", 1, (0, 0, 0), 1.0, 1.0),
    ("equirect->rect bc rot+tonemap",
     f"equirect:{-math.pi},{math.pi},{-math.pi/2},{math.pi/2},36,18",
     "equirect", "rect:35,36,20.25", "rect4k", "bc", 1,
     (20.0, 5.0, 0.0), 2.0, 4.0),
    ("equirect->rect nn seam",
     f"equirect:{-math.pi},{math.pi},{-math.pi/2},{math.pi/2},36,18",
     "equirect", "rect:35,36,27", "rect", "nn", 1, (180.0, 0.0, 0.0),
     1.0, 1.0),
    ("rect->equirect bl ss2",
     "rect:50,36,36", "rect50", f"equirect:{-1.2},{0.8},{-0.6},{0.9},36,36",
     "equirect_part", "bl", 2, (0, 0, 0), 1.0, 1.0),
    ("equidist->equirect bc 4ch tonemap",
     "equidist:{pi},36,36".format(pi=math.pi), "equidist",
     f"equirect:{-math.pi},{math.pi},{-math.pi/2},{math.pi/2},36,18",
     "equirect", "bc", 1, (10.0, -5.0, 3.0), 2.0, 4.0),
    ("equirect_part->equidist bl (clamp input)",
     f"equirect:{-1.2},{0.8},{-0.6},{0.9},36,36", "equirect_part",
     "equidist:{pi},36,36".format(pi=math.pi), "equidist", "bl", 1,
     (0, 0, 0), 1.0, 1.0),
]


def _our_lens(tag):
    from image_lens_reproject_tpu.models.lens import (
        Equirectangular, FisheyeEquidistant, Rectilinear,
        full_equirectangular,
    )

    return {
        "equidist": FisheyeEquidistant(math.pi, 36.0, 36.0),
        "rect": Rectilinear(35.0, 36.0, 27.0),
        "rect4k": Rectilinear(35.0, 36.0, 20.25),
        "rect50": Rectilinear(50.0, 36.0, 36.0),
        "equirect": full_equirectangular(),
        "equirect_part": Equirectangular(
            longitude_min=-1.2, longitude_max=0.8,
            latitude_min=-0.6, latitude_max=0.9,
        ),
    }[tag]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_matches_compiled_reference(case, ref_dump, tmp_path):
    import jax.numpy as jnp

    from image_lens_reproject_tpu.models.rotation import (
        rotation_matrix_degrees,
    )
    from image_lens_reproject_tpu.ops import color, remap

    (name, in_s, in_tag, out_s, out_tag, interp, ns, rot_deg,
     exposure, reinhard) = case
    n_ch = 4 if "4ch" in name else 3
    src = smooth(96, 192, n_ch, seed=hash(name) % 1000)
    out_h, out_w = 64, 128
    want = run_ref(ref_dump, tmp_path, src, in_s, out_s, out_h, out_w,
                   interp, ns, rot_deg, exposure, reinhard)

    interp_name = {"nn": "nearest", "bl": "bilinear", "bc": "bicubic"}[interp]
    rot = None
    if any(rot_deg):
        rot = jnp.asarray(rotation_matrix_degrees(*rot_deg))
    got = remap.remap_image(
        jnp.asarray(src), rot, in_lens=_our_lens(in_tag),
        out_lens=_our_lens(out_tag), out_h=out_h, out_w=out_w,
        interp=interp_name, n_samples=ns,
    )
    if exposure != 1.0 or reinhard != 1.0:
        got = color.post_process(got, exposure, reinhard, xp=jnp)
    got = np.asarray(got)

    err = np.abs(got - want)
    # float32 transcendental ulp differences (libm vs XLA) can flip a
    # nearest tap / bicubic low tap on knife-edge pixels; bound the
    # typical error tightly and the outlier count separately.
    assert np.quantile(err, 0.999) < 1e-4, f"{name}: p999 {np.quantile(err, 0.999)}"
    assert (err.max(axis=-1) > 1e-3).mean() < 2e-3, f"{name}: outliers"
