"""Pass-2b SPLIT-rescue tests (interpret mode).

The split rescue recomputes still-patched sub-tiles BOTH of whose 8x64
halves fit per-piece windows under HALF the (ng, g) gather-lane budget
(remap_kernel._prepass split admission; _make_kernel(split=True) slot
body). It targets cluster-jump windows — seam monotonization and
polar-arc reversals — that no contiguous whole-sub-tile window covers:
on BASELINE cfg2 60.6% of the patched set fits (8, 6) split where 0%
fits it whole (bench/overflow_split_probe.py). These tests pin the
admission fields, the planned-path parity against the XLA reference
(the invariant that every sub-tile is either computed exactly or
patched, SURVEY.md §2.1), and that the split launch touches ONLY its
taken sub-tiles. Hardware behavior (two per-piece DMAs into 4-D
scratch, per-half rolls) is attested by bench/verify_onchip.py's SPLIT
cases — interpret mode cannot vouch for Mosaic lowering.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_lens_reproject_tpu.models.lens import (
    FisheyeEquisolid, full_equirectangular,
)
from image_lens_reproject_tpu.models.rotation import rotation_matrix_degrees
from image_lens_reproject_tpu.ops import remap as remap_ops
from image_lens_reproject_tpu.ops import remap_fused
from image_lens_reproject_tpu.ops.pallas import remap_kernel as RK

@pytest.fixture(autouse=True)
def interpret_mode():
    RK.set_interpret(True)
    yield
    RK.set_interpret(False)


IN = 1024
OUT_H, OUT_W = 1024, 2048
ROW0, BAND = 0, 192
TILING = dict(tile_rows=24, n_groups=3, rb=40, scan_unroll=32, cb=256)
BUDGETS = (8, 6)
INTERP = "bilinear"


def _lenses():
    return (FisheyeEquisolid(15.0, math.pi, 36.0, 36.0),
            full_equirectangular())


def _plan_kw():
    li, lo = _lenses()
    return dict(in_lens=li, out_lens=lo, in_h=IN, in_w=IN,
                out_h=OUT_H, out_w=OUT_W, interp=INTERP, channels=3,
                **TILING)


@pytest.fixture(scope="module")
def band_prepass():
    rot = rotation_matrix_degrees(30.0, 10.0, 5.0)
    pre = RK.make_prepass(rot, with_rescue=True, rescue_budgets=BUDGETS,
                          split_pieces=2, row0=ROW0, band_rows=BAND,
                          **_plan_kw())
    return rot, pre


class TestSplitAdmission:
    def test_fields_shape_and_sets(self, band_prepass):
        rot, pre = band_prepass
        scalars, bad, rescue, split = pre
        assert split is not None and split.ndim == 5 and split.shape[-1] == 2
        bad_n = np.asarray(bad)
        taken = np.asarray(rescue[3] > 0) & bad_n
        patched = bad_n & ~taken
        split_ok = np.asarray(jnp.all(split[3] > 0, axis=3)) & patched
        # the config must actually exercise the split set
        assert split_ok.sum() > 0
        # split admission is strictly harder per piece than the whole
        # budget, so a whole-rescuable sub-tile that also split-fits is
        # fine, but split picks only from the PATCHED remainder here.
        assert not (split_ok & taken).any()

    def test_piece_extents_fit_half_budget(self, band_prepass):
        rot, pre = band_prepass
        _, bad, _, split = pre
        # Recompute per-piece extents like the probe and check every
        # admitted piece is within budget (the admission's core claim).
        kw = _plan_kw()
        n_ty = -(-BAND // TILING["tile_rows"])
        n_tx = -(-OUT_W // RK.TC)
        wrap = RK.wrap_mode_for_input(kw["in_lens"])
        xt, yt = RK._field_taps(
            kw["in_lens"], kw["out_lens"], IN, IN, OUT_H, OUT_W,
            rot, 0.0, 0.0, INTERP, wrap, n_ty, n_tx,
            TILING["tile_rows"], row0=ROW0)
        from image_lens_reproject_tpu.ops.pallas import taps as taps_mod
        xs = jnp.stack(list(xt.idx))
        cmin_u = RK._tile_reduce(jnp.min(xs, axis=0), n_ty, n_tx, "min",
                                 TILING["tile_rows"])
        cmax_u = RK._tile_reduce(jnp.max(xs, axis=0), n_ty, n_tx, "max",
                                 TILING["tile_rows"])
        seam = jnp.logical_and(wrap, (cmax_u - cmin_u) > (IN // 2))
        seam_px = jnp.repeat(jnp.repeat(seam, TILING["tile_rows"], 0),
                             RK.TC, 1)
        xs_m = jnp.stack([
            taps_mod.monotonize_x(i, IN, seam_px, xp=jnp) for i in xt.idx
        ]) + RK.PAD
        kmin = RK._piece_reduce(jnp.min(xs_m, axis=0), n_ty, n_tx, "min",
                                TILING["tile_rows"], 2)
        kmax = RK._piece_reduce(jnp.max(xs_m, axis=0), n_ty, n_tx, "max",
                                TILING["tile_rows"], 2)
        ok = np.asarray(split[3] > 0)
        ext = np.asarray(kmax - kmin) + 1  # margin=0 for bilinear
        half_l = BUDGETS[1] * 128 // 2
        assert (ext[ok] * 3 <= half_l).all()
        # window starts must match the admission fields
        assert (np.asarray(split[1])[ok] == np.asarray(kmin)[ok]).all()

    def test_static_unavailability(self):
        # (8, 6) at C=5: 384 lanes per piece do not divide into texels
        # -> split statically unavailable, slot stays None.
        assert not RK.split_ok_static(6, 5)
        rot = rotation_matrix_degrees(30.0, 10.0, 5.0)
        kw = _plan_kw()
        kw["channels"] = 5
        pre = RK.make_prepass(rot, with_rescue=True, rescue_budgets=BUDGETS,
                              split_pieces=2, row0=ROW0, band_rows=BAND,
                              **kw)
        assert len(pre) == 4 and pre[3] is None

    def test_compile_feasibility_region(self):
        # Measured r5f (verify_r5f.log): (8,6) bilinear C3 OK on chip,
        # (8,6) BICUBIC C3 a Mosaic compile FAIL, C>=4 unprobed — the
        # planner and prepass must stay inside the probed region.
        assert RK.split_feasible(6, 3, 2)       # bilinear C3: attested
        assert not RK.split_feasible(6, 3, 4)   # bicubic: compile FAIL
        assert not RK.split_feasible(6, 4, 2)   # C4: unprobed
        rot = rotation_matrix_degrees(30.0, 10.0, 5.0)
        kw = _plan_kw()
        kw["interp"] = "bicubic"
        pre = RK.make_prepass(rot, with_rescue=True, rescue_budgets=BUDGETS,
                              split_pieces=2, row0=ROW0, band_rows=BAND,
                              **kw)
        assert len(pre) == 4 and pre[3] is None
        p8 = remap_fused.plan_with_rescue(rot, use_rescue=True, split=True,
                                          **kw)
        assert p8[6] is None and p8[7] == 0


class TestSplitParity:
    @pytest.fixture(scope="class")
    def outputs(self, band_prepass):
        # class-scoped: instantiated before the function-scoped autouse
        # interpret fixture, so set interpret mode here too.
        RK.set_interpret(True)
        rot, pre = band_prepass
        scalars, bad, rescue, split = pre
        bad_n = np.asarray(bad)
        taken = np.asarray(rescue[3] > 0) & bad_n
        patched = bad_n & ~taken
        split_ok = np.asarray(jnp.all(split[3] > 0, axis=3)) & patched
        rescue_cap = RK._ceil_to(max(int(taken.sum()), 1), 8)
        split_cap = RK._ceil_to(max(int(split_ok.sum()), 1), 8)
        rng = np.random.default_rng(7)
        src = jnp.asarray(rng.uniform(size=(IN, IN, 3)).astype(np.float32))
        kw = _plan_kw()
        common = dict(
            in_lens=kw["in_lens"], out_lens=kw["out_lens"],
            out_h=OUT_H, out_w=OUT_W, interp=INTERP, row0=ROW0,
            band_rows=BAND, rescue_cap=rescue_cap, rescue_budgets=BUDGETS,
            **TILING)
        on = np.asarray(RK.remap_pallas(
            src, rot, prepass=pre, split_cap=split_cap, **common))
        off = np.asarray(RK.remap_pallas(
            src, rot, prepass=pre[:3], **common))
        ref = np.asarray(remap_ops.remap_image(
            src, rot, in_lens=kw["in_lens"], out_lens=kw["out_lens"],
            out_h=OUT_H, out_w=OUT_W, interp=INTERP,
            row_offset=ROW0, row_count=BAND))
        return on, off, ref, split_ok

    def test_split_band_matches_reference(self, outputs):
        on, off, ref, _ = outputs
        err = np.abs(on - ref)
        # p999 2e-4: this polar-arc band drifts ~1.01e-4 p999 against the
        # jnp reference from the kernel's kxp polynomial trig REGARDLESS
        # of split (the split-off output measures the same); the hard
        # outlier bound stays at the battery's frac>1e-3 criterion, and
        # test_split_touches_only_its_subtiles pins the split's footprint
        # bitwise.
        assert np.quantile(err, 0.999) < 2e-4
        assert (err.max(axis=-1) > 1e-3).mean() < 1e-3
        err_off = np.abs(off - ref)
        assert np.quantile(err, 0.999) <= np.quantile(err_off, 0.999) * 1.5

    def test_split_subtiles_as_exact_as_patch(self, outputs):
        on, off, ref, split_ok = outputs
        n_sub = TILING["tile_rows"] // 8
        m = np.zeros(on.shape[:2], bool)
        for ty, h, tx in np.argwhere(split_ok):
            r = (ty * n_sub + h) * 8
            m[r:r + 8, tx * RK.TC:(tx + 1) * RK.TC] = True
        assert m.any()
        err_on = np.abs(on - ref).max(axis=-1)[m]
        err_off = np.abs(off - ref).max(axis=-1)[m]
        # Within the split-rescued sub-tiles the kernel recompute must be
        # no worse than the XLA patch it replaces (same kxp-drift scale).
        assert np.quantile(err_on, 0.999) < 2e-4
        assert (err_on > 1e-3).mean() < 1e-3
        assert np.quantile(err_on, 0.999) <= np.quantile(err_off, 0.999) * 1.5

    def test_split_touches_only_its_subtiles(self, outputs):
        on, off, ref, split_ok = outputs
        d = np.abs(on - off).max(axis=-1)
        n_sub = TILING["tile_rows"] // 8
        m = np.zeros(d.shape, bool)
        for ty, h, tx in np.argwhere(split_ok):
            r = (ty * n_sub + h) * 8
            m[r:r + 8, tx * RK.TC:(tx + 1) * RK.TC] = True
        assert (d[~m] == 0).all(), "split changed pixels outside its set"


class TestPlanIntegration:
    def test_plan_with_rescue_arity_and_gating(self):
        rot = rotation_matrix_degrees(30.0, 10.0, 5.0)
        kw = _plan_kw()
        p6 = remap_fused.plan_with_rescue(rot, use_rescue=True, **kw)
        assert len(p6) == 6
        p8 = remap_fused.plan_with_rescue(rot, use_rescue=True, split=True,
                                          **kw)
        assert len(p8) == 8
        scalars, bad, rescue, cap, budgets, vpx, split_f, split_cap = p8
        assert (split_f is None) == (split_cap == 0)
        if split_f is not None:
            assert split_cap % 128 == 0 and split_cap > 0
            # the first six fields agree with the no-split plan
            assert budgets == p6[4] and cap == p6[3]

    def test_planned_entry_runs_split(self):
        rot = rotation_matrix_degrees(30.0, 10.0, 5.0)
        kw = _plan_kw()
        p8 = remap_fused.plan_with_rescue(rot, use_rescue=True, split=True,
                                          **kw)
        scalars, bad, rescue, cap, budgets, vpx, split_f, split_cap = p8
        assert split_f is not None, "cfg2-like config must admit split"
        rng = np.random.default_rng(3)
        src = jnp.asarray(rng.uniform(size=(IN, IN, 3)).astype(np.float32))
        out = np.asarray(remap_fused.remap_tonemap_planned(
            src, rot, scalars, bad, rescue, vpx, split_f,
            in_lens=kw["in_lens"], out_lens=kw["out_lens"],
            out_h=OUT_H, out_w=OUT_W, interp=INTERP,
            rescue_cap=cap, rescue_budgets=budgets, split_cap=split_cap,
            **TILING))
        ref = np.asarray(remap_ops.remap_image(
            src, rot, in_lens=kw["in_lens"], out_lens=kw["out_lens"],
            out_h=OUT_H, out_w=OUT_W, interp=INTERP))
        err = np.abs(out - ref)
        # p999 2e-4: at this full-frame size the kernel's kxp polynomial
        # trig drifts ~1.03e-4 p999 against the jnp reference REGARDLESS
        # of split (the split-off plan measures the same; split sub-tiles
        # measure BELOW the patched ones — see TestSplitParity). The
        # hard outlier criterion stays at the battery's frac>1e-3 bound.
        assert np.quantile(err, 0.999) < 2e-4
        assert (err.max(axis=-1) > 1e-3).mean() < 1e-3
