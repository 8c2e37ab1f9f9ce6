"""PIXEL-granular overflow patch tests (interpret mode).

The per-pixel prepass refinement (remap_kernel._prepass pixel_valid /
compact_valid_px) claims: every pixel it marks valid inside a BAD
sub-tile was computed exactly by the kernel, so the patch only needs to
resample the rest. These tests pin vpx-patched outputs against the pure
XLA path pixel-exactly — including the ADVICE-r4 regression: a config
whose tiles have NO usable sub-tile (their scan length is clamped to one
unroll step, so the pre-clamp exactness model over-trusted the kernel).

Reference parity contract: the patched pixels go through the same
sampling formulas as ops/remap.py (reference src/reproject.cpp:243-344),
so they must match the XLA path EXACTLY; kernel-kept pixels match within
the polynomial-trig tolerance like every other kernel test.
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
from image_lens_reproject_tpu.ops import remap, remap_fused
from image_lens_reproject_tpu.ops.pallas import remap_kernel as RK

F = np.float32

RECT = Rectilinear(35.0, 36.0, 27.0)
EQUIDIST = FisheyeEquidistant(math.pi, 36.0, 36.0)
EQUISOLID = FisheyeEquisolid(15.0, math.pi, 36.0, 36.0)
EQUIRECT = full_equirectangular()


@pytest.fixture(autouse=True)
def interpret_mode():
    RK.set_interpret(True)
    yield
    RK.set_interpret(False)


def smooth(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(
        np.linspace(0, 1, h, dtype=F), np.linspace(0, 1, w, dtype=F),
        indexing="ij",
    )
    return np.stack(
        [0.5 + 0.45 * np.sin(4 * a * xx + 3 * b * yy + p)
         for a, b, p in rng.uniform(0.5, 2, (c, 3))],
        -1,
    ).astype(F)


def xla_ref(src, rot, in_lens, out_lens, oh, ow, interp, n_samples=1):
    return np.asarray(remap.remap_image(
        src, rot, in_lens=in_lens, out_lens=out_lens,
        out_h=oh, out_w=ow, interp=interp, n_samples=n_samples,
    ))


def plan_counts(rot, **kw):
    """(bad, vpx) prepass fields for a config (no rescue)."""
    plan = remap_fused.make_plan(rot, with_rescue=False, pixel_valid=True,
                                 **kw)
    return plan[1], plan[2]


class TestInlinePixelPatch:
    # Polar-arc-style config: equirect -> equidistant fisheye has a ring
    # of bad sub-tiles whose pixels are partly still kernel-exact (the
    # overflow-cascade shape of BASELINE cfg2/cfg4, scaled down; probed:
    # 17/40 sub-tiles bad, 13307/17408 bad-sub-tile pixels invalid —
    # under the 60% pixel cap, so the pallas branch + pixel patch run).
    KW = dict(in_lens=EQUIRECT, out_lens=EQUIDIST, out_h=160, out_w=160,
              interp="bilinear", n_samples=1)
    SRC = (128, 256)
    TILING = dict(tile_rows=8, n_groups=2, rb=40, scan_unroll=8)

    def _check_cfg(self, src, rot, kw, tiling, *, require_mixed=True):
        bad, vpx = plan_counts(
            rot, in_lens=kw["in_lens"], out_lens=kw["out_lens"],
            in_h=int(src.shape[0]), in_w=int(src.shape[1]),
            out_h=kw["out_h"], out_w=kw["out_w"], interp=kw["interp"],
            n_samples=kw["n_samples"], channels=int(src.shape[2]),
            **tiling,
        )
        n_bad = int(np.asarray(jnp.sum(bad)))
        assert n_bad > 0, "config must exercise the patch"
        bad_px = np.repeat(np.repeat(
            np.asarray(bad), 8, axis=1).reshape(-1, bad.shape[2]),
            RK.TC, axis=1)
        inv = bad_px & ~np.asarray(vpx)
        _, max_bad_px, _ = RK._px_patch_sizes(bad_px.size)
        assert inv.sum() <= max_bad_px, (
            "config exceeds the pixel cap - it would test the XLA "
            "fallback, not the pixel patch")
        if require_mixed:
            # the pixel refinement must actually split bad sub-tiles
            assert 0 < inv.sum() < bad_px.sum()
        got = np.asarray(RK.remap_pallas(
            src, rot, pixel_patch=True, **kw, **tiling))
        want = xla_ref(src, rot, kw["in_lens"], kw["out_lens"],
                       kw["out_h"], kw["out_w"], kw["interp"],
                       kw["n_samples"])
        err = np.abs(got - want)
        assert np.quantile(err, 0.999) < 1e-4
        assert (err.max(axis=-1) > 1e-3).mean() < 1e-3

    def test_matches_xla(self):
        src = jnp.asarray(smooth(*self.SRC, 3, seed=5))
        rot = jnp.asarray(rotation_matrix_degrees(30.0, 10.0, 5.0))
        self._check_cfg(src, rot, self.KW, self.TILING)

    def test_patched_pixels_pinned_to_xla(self):
        # The pixel patch samples through the same formulas as the XLA
        # path; only XLA's shape-dependent fusion/rounding may differ
        # (flat per-pixel vs broadcast-grid coordinate evaluation: an
        # ulp of sx/sy moves a bilinear weight ~1e-5 on steep
        # gradients; measured max 1.8e-5 on 20 of 12923 pixels). A
        # pixel the patch MISSED would carry kernel garbage (~1e-1),
        # so this pin proves every invalid pixel was actually patched.
        src = jnp.asarray(smooth(*self.SRC, 3, seed=6))
        rot = jnp.asarray(rotation_matrix_degrees(30.0, 10.0, 5.0))
        kw, tiling = self.KW, self.TILING
        bad, vpx = plan_counts(
            rot, in_lens=kw["in_lens"], out_lens=kw["out_lens"],
            in_h=self.SRC[0], in_w=self.SRC[1], out_h=kw["out_h"],
            out_w=kw["out_w"], interp=kw["interp"], n_samples=1,
            channels=3, **tiling,
        )
        got = np.asarray(RK.remap_pallas(
            src, rot, pixel_patch=True, **kw, **tiling))
        want = xla_ref(src, rot, kw["in_lens"], kw["out_lens"],
                       kw["out_h"], kw["out_w"], kw["interp"])
        bad_px = np.repeat(np.repeat(
            np.asarray(bad), 8, axis=1).reshape(-1, bad.shape[2]),
            RK.TC, axis=1)
        inv = (bad_px & ~np.asarray(vpx))[:kw["out_h"], :kw["out_w"]]
        assert inv.sum() > 0
        np.testing.assert_allclose(got[inv], want[inv], atol=5e-5, rtol=0)

    def test_fully_bad_tiles_scan_clamp(self):
        # ADVICE r4 (high) regression: tiles with NO usable sub-tile run
        # the kernel with their scan clamped to one unroll step; the
        # per-pixel model must check taps against THAT scan length, not
        # the pre-clamp one, or it marks never-computed pixels exact.
        # equirect->equidistant at tr=24 with a small group budget
        # leaves whole fisheye-rim tiles without a usable sub-tile
        # (probed: 4 of 7 tiles fully bad, invalid pixels under the
        # cap so the pallas branch runs).
        src = jnp.asarray(smooth(128, 256, 3, seed=7))
        rot = jnp.asarray(rotation_matrix_degrees(30.0, 10.0, 5.0))
        kw = dict(in_lens=EQUIRECT, out_lens=EQUIDIST, out_h=160,
                  out_w=160, interp="bilinear", n_samples=1)
        tiling = dict(tile_rows=24, n_groups=2, rb=40, scan_unroll=8)
        plan = remap_fused.make_plan(
            rot, with_rescue=False, pixel_valid=True,
            in_lens=kw["in_lens"], out_lens=kw["out_lens"],
            in_h=128, in_w=256, out_h=kw["out_h"], out_w=kw["out_w"],
            interp=kw["interp"], n_samples=1, channels=3, **tiling,
        )
        bad = np.asarray(plan[1])
        fully_bad = bad.all(axis=1)
        assert fully_bad.any(), (
            "config must include tiles with no usable sub-tile "
            "(the scan-clamp case this test pins)")
        got = np.asarray(RK.remap_pallas(
            src, rot, pixel_patch=True, **kw, **tiling))
        want = xla_ref(src, rot, kw["in_lens"], kw["out_lens"],
                       kw["out_h"], kw["out_w"], kw["interp"])
        err = np.abs(got - want)
        assert np.quantile(err, 0.999) < 1e-4
        assert (err.max(axis=-1) > 1e-3).mean() < 1e-3


class TestPlannedPixelPatch:
    def test_compact_list_matches_inline_mask(self):
        # compact_valid_px (plan-time) must produce exactly the index
        # list the launch's inline-mask path would compact per frame.
        rot = jnp.asarray(rotation_matrix_degrees(30.0, 10.0, 5.0))
        kw = dict(in_lens=EQUIRECT, out_lens=EQUIDIST,
                  in_h=128, in_w=256, out_h=160, out_w=160,
                  interp="bilinear", n_samples=1, channels=3,
                  tile_rows=8, n_groups=2, rb=40, scan_unroll=8)
        plan = remap_fused.make_plan(rot, with_rescue=False,
                                     pixel_valid=True, **kw)
        bad, vpx = plan[1], plan[2]
        compact = RK.compact_valid_px(bad, None, 0, vpx, tile_rows=8)
        n_ty, n_sub, n_tx = bad.shape
        mask = np.repeat(np.repeat(
            np.asarray(bad), 8, axis=1).reshape(n_ty * 8, n_tx),
            RK.TC, axis=1) & ~np.asarray(vpx)
        iy, ix = np.nonzero(mask)
        n = len(iy)
        got = np.asarray(compact)
        assert got.shape[0] == 2
        assert n < got.shape[1], "config must stay under the cap"
        np.testing.assert_array_equal(got[0, :n], iy)
        np.testing.assert_array_equal(got[1, :n], ix)
        assert (got[:, n:] == -1).all()

    def test_planned_equals_inline_and_xla(self, monkeypatch):
        src = jnp.asarray(smooth(128, 256, 3, seed=8))
        rot = jnp.asarray(rotation_matrix_degrees(30.0, 10.0, 5.0))
        kw = dict(in_lens=EQUIRECT, out_lens=EQUIDIST, out_h=160,
                  out_w=160, interp="bilinear", n_samples=1)
        tiling = dict(tile_rows=8, n_groups=2, rb=40, scan_unroll=8)
        # This test pins the PLUMBING (planned == inline == XLA), not the
        # cost chooser: pin the px cost to the block cost so the fixture
        # (f_inv ~ 0.76) is admitted regardless of the fitted constants
        # (test_px_admission_is_cost_based covers the chooser).
        monkeypatch.setattr(RK, "_PX_PATCH_NS_PER_PX", RK._PATCH_NS_PER_PX)
        (scalars, bad, rescue, cap, budgets, valid_px) = (
            remap_fused.plan_with_rescue(
                rot, use_rescue=False, pixel_patch=True,
                in_lens=kw["in_lens"], out_lens=kw["out_lens"],
                in_h=128, in_w=256, out_h=kw["out_h"], out_w=kw["out_w"],
                interp=kw["interp"], n_samples=1, channels=3, **tiling,
            )
        )
        assert valid_px is not None and valid_px.dtype == jnp.int32
        got = np.asarray(remap_fused.remap_tonemap_planned(
            src, rot, scalars, bad, rescue, valid_px,
            rescue_cap=cap, rescue_budgets=budgets, **kw, **tiling))
        inline = np.asarray(RK.remap_pallas(
            src, rot, pixel_patch=True, **kw, **tiling))
        np.testing.assert_array_equal(got, inline)
        want = xla_ref(src, rot, kw["in_lens"], kw["out_lens"],
                       kw["out_h"], kw["out_w"], kw["interp"])
        err = np.abs(got - want)
        assert np.quantile(err, 0.999) < 1e-4

    def test_planned_with_rescue_matches_xla(self, monkeypatch):
        # Rescue + pixel patch together: rescued sub-tiles are computed
        # exactly by pass 2 and must NOT appear in the pixel patch list.
        src = jnp.asarray(smooth(128, 256, 3, seed=9))
        rot = jnp.asarray(rotation_matrix_degrees(30.0, 10.0, 5.0))
        kw = dict(in_lens=EQUIRECT, out_lens=EQUIDIST, out_h=160,
                  out_w=160, interp="bilinear", n_samples=1)
        tiling = dict(tile_rows=8, n_groups=2, rb=40, scan_unroll=8)
        monkeypatch.setattr(RK, "_PX_PATCH_NS_PER_PX", RK._PATCH_NS_PER_PX)
        (scalars, bad, rescue, cap, budgets, valid_px) = (
            remap_fused.plan_with_rescue(
                rot, use_rescue=True, pixel_patch=True,
                in_lens=kw["in_lens"], out_lens=kw["out_lens"],
                in_h=128, in_w=256, out_h=kw["out_h"], out_w=kw["out_w"],
                interp=kw["interp"], n_samples=1, channels=3, **tiling,
            )
        )
        if rescue is not None and valid_px is not None:
            # no pixel-patch slot may fall inside a rescued sub-tile
            taken = np.asarray(RK._rescue_taken(bad, rescue, cap))
            vv = np.asarray(valid_px)
            live = vv[0] >= 0
            ty = vv[0][live] // tiling["tile_rows"]
            sub = (vv[0][live] % tiling["tile_rows"]) // 8
            tx = vv[1][live] // RK.TC
            assert not taken[ty, sub, tx].any()
        got = np.asarray(remap_fused.remap_tonemap_planned(
            src, rot, scalars, bad, rescue, valid_px,
            rescue_cap=cap, rescue_budgets=budgets, **kw, **tiling))
        want = xla_ref(src, rot, kw["in_lens"], kw["out_lens"],
                       kw["out_h"], kw["out_w"], kw["interp"])
        err = np.abs(got - want)
        assert np.quantile(err, 0.999) < 1e-4
        assert (err.max(axis=-1) > 1e-3).mean() < 1e-3

    def test_px_admission_is_cost_based(self, monkeypatch):
        # The chooser admits the pixel list only when its modeled cost
        # beats the sub-tile block patch: n_inv * px_ns < bad_px *
        # block_ns. This fixture's invalid fraction is ~0.76, so the
        # r5-measured constants (px ~3.9x block) must REJECT it, and a
        # px cost pinned at the block cost must ADMIT it. Guards the
        # measured 2x regression (cfg2 101.7 -> 45.2 Mpix/s,
        # bench/recovery_out/cfg2px_r5.log) from returning.
        rot = jnp.asarray(rotation_matrix_degrees(30.0, 10.0, 5.0))
        kw = dict(in_lens=EQUIRECT, out_lens=EQUIDIST,
                  in_h=128, in_w=256, out_h=160, out_w=160,
                  interp="bilinear", n_samples=1, channels=3,
                  tile_rows=8, n_groups=2, rb=40, scan_unroll=8)
        out = remap_fused.plan_with_rescue(
            rot, use_rescue=False, pixel_patch=True, **kw)
        assert out[5] is None, "f_inv ~0.76 must lose to the block patch"
        monkeypatch.setattr(RK, "_PX_PATCH_NS_PER_PX", RK._PATCH_NS_PER_PX)
        out = remap_fused.plan_with_rescue(
            rot, use_rescue=False, pixel_patch=True, **kw)
        assert out[5] is not None

    def test_rescue_ladder_uses_effective_patch_cost(self, monkeypatch):
        # JOINT ranking: a cheap pixel list devalues rescue (a skipped
        # sub-tile then costs f_inv * px_ns, not the full block patch).
        # With px pinned ~free, every ladder entry's margin goes
        # negative and the plan must drop rescue in favor of the pixel
        # list; with px pinned huge, the block-patch ranking is
        # unchanged (rescue stays if it was winning).
        rot = jnp.asarray(rotation_matrix_degrees(30.0, 10.0, 5.0))
        kw = dict(in_lens=EQUIRECT, out_lens=EQUIDIST,
                  in_h=128, in_w=256, out_h=160, out_w=160,
                  interp="bilinear", n_samples=1, channels=3,
                  tile_rows=8, n_groups=2, rb=40, scan_unroll=8)
        monkeypatch.setattr(RK, "_PX_PATCH_NS_PER_PX", 1e-3)
        out = remap_fused.plan_with_rescue(
            rot, use_rescue=True, pixel_patch=True, **kw)
        assert out[2] is None and out[3] == 0
        assert out[5] is not None
        monkeypatch.setattr(RK, "_PX_PATCH_NS_PER_PX", 1e9)
        base = remap_fused.plan_with_rescue(
            rot, use_rescue=True, pixel_patch=False, **kw)
        out = remap_fused.plan_with_rescue(
            rot, use_rescue=True, pixel_patch=True, **kw)
        assert out[5] is None
        assert (out[2] is None) == (base[2] is None)
        assert out[4] == base[4]

    def test_ww2_plan_returns_no_valid_px(self):
        # ww2/whole-window bodies have no per-pixel exactness model; the
        # plan must return valid_px=None rather than a stale mask.
        out = remap_fused.plan_with_rescue(
            None, use_rescue=False, pixel_patch=True,
            in_lens=EQUIRECT, out_lens=RECT, in_h=96, in_w=192,
            out_h=64, out_w=128, interp="bilinear", n_samples=1,
            channels=3, tile_rows=8, n_groups=1, rb=24, scan_unroll=-17,
        )
        assert out[5] is None

    def test_pixel_overflow_cap_falls_back_to_xla(self):
        # rect -> full equirect: almost everything is invalid per pixel;
        # the launch must gate on the PIXEL count and take the full XLA
        # branch, still exact.
        src = jnp.asarray(smooth(64, 96, 3, seed=10))
        kw = dict(in_lens=RECT, out_lens=EQUIRECT, out_h=48, out_w=128,
                  interp="bilinear", n_samples=1)
        tiling = dict(tile_rows=8, n_groups=2, rb=40, scan_unroll=8)
        got = np.asarray(RK.remap_pallas(
            src, None, pixel_patch=True, **kw, **tiling))
        want = xla_ref(src, None, kw["in_lens"], kw["out_lens"],
                       kw["out_h"], kw["out_w"], kw["interp"])
        err = np.abs(got - want)
        assert np.quantile(err, 0.999) < 1e-4


class TestDispatchGating:
    def test_pixel_patch_env_override(self, monkeypatch):
        from image_lens_reproject_tpu.ops import dispatch

        monkeypatch.setenv("ILR_PIXEL_PATCH", "1")
        assert dispatch.pixel_patch_enabled()
        monkeypatch.setenv("ILR_PIXEL_PATCH", "0")
        assert not dispatch.pixel_patch_enabled()

    def test_pixel_patch_requires_vpx_attestation(self, monkeypatch, tmp_path):
        from image_lens_reproject_tpu.ops import dispatch

        monkeypatch.delenv("ILR_PIXEL_PATCH", raising=False)
        marker = tmp_path / ".onchip_verified.json"
        monkeypatch.setattr(dispatch, "_MARKER_PATH", marker)
        dispatch.write_onchip_marker("tpu", "full", 0, 0, 0)  # no vpx count
        monkeypatch.setattr(dispatch, "kernel_source_digest",
                            lambda: __import__("json").loads(
                                marker.read_text())["digest"])
        assert dispatch.rescue_enabled()
        assert not dispatch.pixel_patch_enabled()
        dispatch.write_onchip_marker("tpu", "full", 0, 0, 0, 0)
        assert dispatch.pixel_patch_enabled()

    def test_marker_rejects_mid_battery_edit(self, monkeypatch, tmp_path):
        # VERDICT r4 #4: the marker must attest the sources the battery
        # RAN, not whatever is on disk at write time.
        from image_lens_reproject_tpu.ops import dispatch

        marker = tmp_path / ".onchip_verified.json"
        monkeypatch.setattr(dispatch, "_MARKER_PATH", marker)
        start = dispatch.read_kernel_source_digest()
        # simulate a mid-battery edit: the on-disk digest changes
        monkeypatch.setattr(dispatch, "read_kernel_source_digest",
                            lambda: "0" * 64)
        with pytest.raises(RuntimeError, match="changed while"):
            dispatch.write_onchip_marker("tpu", "full", 0, 0, 0, 0,
                                         start_digest=start)
        assert not marker.exists()
