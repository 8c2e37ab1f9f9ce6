"""Rescue hardware-verification gating (ops/dispatch).

The pass-2 rescue launch exercises Mosaic primitives interpret mode
cannot validate, so the pipeline/bench only enable it with on-chip
evidence for the CURRENT kernel sources: a `.onchip_verified.json`
marker written by a zero-failure bench/verify_onchip.py run on a real
TPU, keyed by a digest of the kernel source files (any kernel edit
invalidates it). ILR_RESCUE=1/0 overrides either way.
"""

import json
from pathlib import Path

import pytest

from image_lens_reproject_tpu.ops import dispatch


@pytest.fixture
def marker(tmp_path, monkeypatch):
    path = tmp_path / ".onchip_verified.json"
    monkeypatch.setattr(dispatch, "_MARKER_PATH", path)
    monkeypatch.delenv("ILR_RESCUE", raising=False)
    return path


def test_digest_is_stable_and_kernel_source_sensitive():
    d1 = dispatch.kernel_source_digest()
    d2 = dispatch.kernel_source_digest()
    assert d1 == d2 and len(d1) == 64
    # Every attested source exists (a rename must update the list).
    base = Path(dispatch.__file__).resolve().parent
    for rel in dispatch._KERNEL_SOURCES:
        assert (base / rel).is_file(), rel


def test_digest_covers_every_pallas_source():
    # Every kernel-side module must be in the attested set: a module
    # absent from _KERNEL_SOURCES can be edited without invalidating
    # the marker — the same attestation-soundness class as the round-4
    # mid-battery-edit race (pallas/ww2.py was missing until round 5).
    # __init__.py is exempt: a pure re-export surface with no kernel
    # code.
    base = Path(dispatch.__file__).resolve().parent
    pallas = {f"pallas/{p.name}" for p in (base / "pallas").glob("*.py")
              if p.name != "__init__.py"}
    assert pallas <= set(dispatch._KERNEL_SOURCES), (
        pallas - set(dispatch._KERNEL_SOURCES))


def test_no_marker_means_disabled(marker):
    assert not dispatch.rescue_verified()
    assert not dispatch.rescue_enabled()


def test_env_overrides(marker, monkeypatch):
    monkeypatch.setenv("ILR_RESCUE", "1")
    assert dispatch.rescue_enabled()
    monkeypatch.setenv("ILR_RESCUE", "0")
    assert not dispatch.rescue_enabled()


def test_cli_override_beats_env(marker, monkeypatch):
    monkeypatch.setenv("ILR_RESCUE", "0")
    dispatch.set_rescue_override(True)
    try:
        assert dispatch.rescue_enabled()
        dispatch.set_rescue_override(False)
        monkeypatch.setenv("ILR_RESCUE", "1")
        assert not dispatch.rescue_enabled()
    finally:
        dispatch.set_rescue_override(None)


def test_cli_rescue_flag_sets_override(marker, monkeypatch, tmp_path):
    from image_lens_reproject_tpu import cli as cli_mod

    seen = []
    monkeypatch.setattr(dispatch, "set_rescue_override",
                        lambda v: seen.append(v))
    monkeypatch.setattr(cli_mod, "run_pipeline",
                        lambda paths, outd, opts: type(
                            "S", (), {"failed": [], "done": 0})())
    argv = ["--no-configs", "16,16", "--single", str(tmp_path / "x.png"),
            "--i-equidistant", "3.14159", "--rectilinear", "35,36",
            "--png", "-o", str(tmp_path / "o"), "--rescue", "off"]
    assert cli_mod.main(argv) == 0
    assert seen == [False]


def test_marker_roundtrip_enables(marker):
    dispatch.write_onchip_marker("tpu", "21 configs", failures=0)
    assert dispatch.rescue_verified()
    assert dispatch.rescue_enabled()
    rec = json.loads(marker.read_text())
    assert rec["digest"] == dispatch.kernel_source_digest()


def test_split_gating(marker, monkeypatch):
    # no marker: disabled; env override wins; CLI override beats env;
    # a marker missing the split bucket (pre-split battery) NEVER
    # attests split even with base failures clean.
    monkeypatch.delenv("ILR_SPLIT", raising=False)
    assert not dispatch.split_verified()
    assert not dispatch.split_enabled()
    monkeypatch.setenv("ILR_SPLIT", "1")
    assert dispatch.split_enabled()
    dispatch.set_split_override(False)
    try:
        assert not dispatch.split_enabled()
    finally:
        dispatch.set_split_override(None)
    monkeypatch.delenv("ILR_SPLIT", raising=False)
    dispatch.write_onchip_marker("tpu", "36 configs", failures=0)
    assert dispatch.rescue_verified()
    assert not dispatch.split_verified()  # split_failures = -1 default
    dispatch.write_onchip_marker("tpu", "39 configs", failures=0,
                                 split_failures=0)
    assert dispatch.split_verified()
    assert dispatch.split_enabled()
    dispatch.write_onchip_marker("tpu", "39 configs", failures=0,
                                 split_failures=2)
    assert dispatch.rescue_verified()
    assert not dispatch.split_verified()


def test_failed_or_cpu_marker_does_not_enable(marker):
    dispatch.write_onchip_marker("tpu", "21 configs", failures=2)
    assert not dispatch.rescue_verified()
    dispatch.write_onchip_marker("cpu", "21 configs", failures=0)
    assert not dispatch.rescue_verified()


def test_stale_digest_does_not_enable(marker):
    dispatch.write_onchip_marker("tpu", "21 configs", failures=0)
    rec = json.loads(marker.read_text())
    rec["digest"] = "0" * 64  # kernel sources changed since verification
    marker.write_text(json.dumps(rec))
    assert not dispatch.rescue_verified()


def test_corrupt_marker_is_disabled(marker):
    marker.write_text("{not json")
    assert not dispatch.rescue_verified()


def test_ww2_gate_is_independent_of_rescue(marker):
    # ww2 failures must not withhold the rescue attestation, and an
    # ww2-failing marker must not admit ww2 planner candidates.
    dispatch.write_onchip_marker("tpu", "31 configs", failures=0,
                                 ww2_failures=2)
    assert dispatch.rescue_verified()
    assert not dispatch.ww2_verified()
    dispatch.write_onchip_marker("tpu", "31 configs", failures=0,
                                 ww2_failures=0)
    assert dispatch.ww2_verified()
    # a rescue failure blocks ww2 too (shared prepass/patch machinery)
    dispatch.write_onchip_marker("tpu", "31 configs", failures=1,
                                 ww2_failures=0)
    assert not dispatch.ww2_verified()


def test_t128_gate_requires_explicit_attestation(marker):
    # tr=128 tall tiles gate separately: only a battery that EXERCISED
    # the T128 cases (t128_failures == 0, not the -1 "not exercised"
    # default) attests them; a T128 failure must not withhold the
    # rescue/ww2 attestations.
    dispatch.write_onchip_marker("tpu", "33 configs", failures=0,
                                 ww2_failures=0)  # t128 not exercised
    assert dispatch.rescue_verified() and dispatch.ww2_verified()
    assert not dispatch.t128_verified()
    dispatch.write_onchip_marker("tpu", "33 configs", failures=0,
                                 ww2_failures=0, t128_failures=3)
    assert dispatch.rescue_verified() and dispatch.ww2_verified()
    assert not dispatch.t128_verified()
    dispatch.write_onchip_marker("tpu", "33 configs", failures=0,
                                 ww2_failures=0, t128_failures=0)
    assert dispatch.t128_verified()
    # a base failure blocks t128 too (shared machinery)
    dispatch.write_onchip_marker("tpu", "33 configs", failures=1,
                                 ww2_failures=0, t128_failures=0)
    assert not dispatch.t128_verified()


def test_t128_candidates_gated_in_planner(marker, monkeypatch):
    # suggest_tiling must never emit a tr=128 pick without the
    # hardware attestation (Mosaic compile feasibility is unprobed
    # territory at 16 unrolled sub-tiles), and must consider them with
    # it. The modeled ww2 per-tile share (fitted 1450 ns) makes tr=128
    # the argmin on the smooth headline config once admitted.
    from image_lens_reproject_tpu.models.lens import (
        Rectilinear, full_equirectangular)
    from image_lens_reproject_tpu.models.rotation import rotation_matrix_degrees
    from image_lens_reproject_tpu.ops.pallas import remap_kernel as RKm

    rot = rotation_matrix_degrees(20.0, 5.0, 0.0)
    args = (full_equirectangular(), Rectilinear(35.0, 36.0, 36.0 * 2160 / 3840),
            1920, 3840, 2160, 3840, rot, "bicubic")
    monkeypatch.setattr(dispatch, "ww2_verified", lambda: True)
    monkeypatch.setattr(dispatch, "t128_verified", lambda: False)
    tr, *_ = RKm.suggest_tiling(*args)
    assert tr <= 64
    monkeypatch.setattr(dispatch, "t128_verified", lambda: True)
    tr, ng, rb, su, cb = RKm.suggest_tiling(*args)
    assert (tr, ng) == (128, 1) and su <= -17


def test_pre_split_marker_does_not_attest_ww2(marker):
    # markers written before the ww2_failures split carry no ww2 count;
    # they keep enabling rescue but never ww2
    import json as _json
    dispatch.write_onchip_marker("tpu", "27 configs", failures=0)
    rec = _json.loads(marker.read_text())
    del rec["ww2_failures"]
    marker.write_text(_json.dumps(rec))
    assert dispatch.rescue_verified()
    assert not dispatch.ww2_verified()
