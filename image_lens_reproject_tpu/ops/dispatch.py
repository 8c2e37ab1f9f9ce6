"""Kernel-path dispatch: Pallas fused kernel vs pure-XLA remap.

The framework has two device implementations of the remap:

* the pure-XLA path (ops/remap.py) — the always-correct reference path,
  runs on any backend (CPU tests, TPU);
* the Pallas fused kernel (ops/pallas/remap_kernel.py) — the performance
  path on TPU, fusing coordinate generation, gather-interpolation and
  tonemap over VMEM tiles.

Selection: Pallas is used automatically on TPU backends when the
(lens, interp) combination is supported by the kernel; force the pure-XLA
path with ``set_pure_xla(True)`` or the CLI ``--pure-xla`` flag.

Rescue gating: the pass-2 rescue launch exercises Mosaic primitives
(dynamic lane rolls, lane-dim gathers) that interpret mode cannot
validate — a hardware miscompile there would produce silently wrong
pixels. The pipeline/bench therefore enable rescue only when
``bench/verify_onchip.py`` has PASSED on a real TPU against the CURRENT
kernel sources (recorded in ``.onchip_verified.json`` at the repo root,
keyed by a digest of the kernel source files so any kernel edit
invalidates it), or when explicitly forced with ``ILR_RESCUE=1``.
Rescue off is a performance fallback (bad sub-tiles take the XLA patch
path), never a correctness change.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

_pure_xla = False

# Sources whose behavior the on-chip verification battery attests; any
# edit to these invalidates the marker (CLAUDE.md: on-chip verification
# is REQUIRED after ANY kernel change).
_KERNEL_SOURCES = (
    "pallas/remap_kernel.py",
    "pallas/taps.py",
    "pallas/kernel_math.py",
    "pallas/ww2.py",
    "remap_fused.py",
)
_MARKER_PATH = Path(__file__).resolve().parents[2] / ".onchip_verified.json"


def set_pure_xla(value: bool) -> None:
    global _pure_xla
    _pure_xla = bool(value)


def pure_xla_forced() -> bool:
    return _pure_xla


_digest_cache = None


def kernel_source_digest() -> str:
    """sha256 over the kernel sources the on-chip battery attests.

    Memoized: sources cannot change under a running process, and
    rescue_enabled() is consulted per plan lookup.
    """
    global _digest_cache
    if _digest_cache is None:
        h = hashlib.sha256()
        base = Path(__file__).resolve().parent
        for rel in _KERNEL_SOURCES:
            h.update((base / rel).read_bytes())
        _digest_cache = h.hexdigest()
    return _digest_cache


def read_kernel_source_digest() -> str:
    """UNMEMOIZED digest of the kernel sources as they are on disk NOW.

    The battery calls this at START and passes the value to
    ``write_onchip_marker`` — the marker must attest the code the cases
    actually executed, not whatever is on disk when the battery ends
    (round 4 shipped a marker whose digest postdated the run: a kernel
    edit landed mid-battery and the memoized digest was first computed
    at marker-write time)."""
    h = hashlib.sha256()
    base = Path(__file__).resolve().parent
    for rel in _KERNEL_SOURCES:
        h.update((base / rel).read_bytes())
    return h.hexdigest()


def write_onchip_marker(platform: str, battery: str, failures: int,
                        ww2_failures: int = 0,
                        t128_failures: int = -1,
                        vpx_failures: int = -1,
                        split_failures: int = -1,
                        start_digest: str = "") -> None:
    """Record an on-chip verification result (bench/verify_onchip.py).

    Only a zero-failure run on a real TPU produces a marker that
    ``rescue_verified`` accepts; ``ww2_failures`` is tracked separately
    so a broken ww2 body cannot withhold the rescue attestation (and
    vice versa — ``ww2_verified`` requires BOTH counts clean, since the
    battery's ww2 cases assume the shared prepass/patch machinery).
    ``t128_failures`` attests the tr=128 tall-tile cases and
    ``vpx_failures`` the pixel-granular-patch cases the same way
    (-1 = not exercised: batteries predating those cases never attest
    them).

    ``start_digest`` (from ``read_kernel_source_digest()`` at battery
    START) closes the mid-run-edit race: if the sources on disk no
    longer hash to it, the battery verified code that is not the code a
    later process would run — refuse the marker.
    """
    import time

    if start_digest:
        now = read_kernel_source_digest()
        if now != start_digest:
            raise RuntimeError(
                "kernel sources changed while the verification battery "
                f"ran (start digest {start_digest[:12]}…, now "
                f"{now[:12]}…) — the results attest stale code; re-run "
                "the battery against the current sources"
            )

    _MARKER_PATH.write_text(json.dumps({
        "digest": start_digest or kernel_source_digest(),
        "platform": platform,
        "battery": battery,
        "failures": failures,
        "ww2_failures": ww2_failures,
        "t128_failures": t128_failures,
        "vpx_failures": vpx_failures,
        "split_failures": split_failures,
        "when": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }, indent=1) + "\n")


def _marker_record():
    try:
        rec = json.loads(_MARKER_PATH.read_text())
    except (OSError, ValueError):
        return None
    if rec.get("platform") != "tpu" or rec.get("digest") != kernel_source_digest():
        return None
    return rec


def rescue_verified() -> bool:
    """True iff the current kernel sources passed verify_onchip on a TPU."""
    rec = _marker_record()
    return rec is not None and rec.get("failures") == 0


def ww2_verified() -> bool:
    """True iff the two-step-gather body also verified on hardware.

    Gates suggest_tiling's ww2 candidates; markers written before the
    ww2 split (no ``ww2_failures`` key) do not attest it.
    """
    rec = _marker_record()
    return (
        rec is not None
        and rec.get("failures") == 0
        and rec.get("ww2_failures") == 0
    )


def split_verified() -> bool:
    """True iff the pass-2b SPLIT-rescue cases verified on hardware.

    The split launch adds new Mosaic surface (two per-piece window DMAs
    per slot into a 4-D scratch, per-half lane/vertical rolls, lane-
    half-selected index bases) that interpret mode cannot vouch for —
    the planner only emits split caps with this attestation.
    """
    rec = _marker_record()
    return (
        rec is not None
        and rec.get("failures") == 0
        and rec.get("split_failures") == 0
    )


_split_override = None  # None = auto; True/False from --split on|off


def set_split_override(value) -> None:
    """CLI --split on|off (None = auto)."""
    global _split_override
    _split_override = value


def split_enabled() -> bool:
    """Should the pipeline/bench enable the pass-2b split rescue?

    Precedence: the CLI ``--split on|off`` override, then
    ``ILR_SPLIT=1``/``0`` (the verification battery itself), else
    auto: on only with hardware evidence for the current sources.
    """
    if _split_override is not None:
        return bool(_split_override)
    env = os.environ.get("ILR_SPLIT")
    if env in ("0", "1"):
        return env == "1"
    return split_verified()


def t128_verified() -> bool:
    """True iff the tr=128 tall-tile cases verified on hardware.

    Gates suggest_tiling's _T128_CANDIDATES: tr=128 means 16 unrolled
    sub-tiles per tile body and the SC=40 scalar layout — exactly the
    Mosaic compile-feasibility territory (scoped-VMEM stack) where an
    unprobed pick could hard-fail or miscompile, so tr=128 is only
    admitted after the battery's T128 cases pass on a real chip.
    Markers without the ``t128_failures`` key (or with -1, meaning the
    battery did not exercise those cases) do not attest it.
    """
    rec = _marker_record()
    return (
        rec is not None
        and rec.get("failures") == 0
        and rec.get("t128_failures", -1) == 0
    )


def vpx_verified() -> bool:
    """True iff the pixel-granular-patch cases verified on hardware.

    Gates the pipeline/bench pixel_patch plans: vpx itself is XLA-side
    (the prepass), but its claim — "the kernel computed this pixel
    exactly" — is about REAL kernel behavior, which only the on-chip
    battery can attest (interpret mode cannot see Mosaic miscompiles).
    Markers without the ``vpx_failures`` key (or with -1) do not attest
    it.
    """
    rec = _marker_record()
    return (
        rec is not None
        and rec.get("failures") == 0
        and rec.get("vpx_failures", -1) == 0
    )


def pixel_patch_enabled() -> bool:
    """Should the pipeline/bench build PIXEL-granular patch plans?

    ``ILR_PIXEL_PATCH=1``/``0`` overrides (the battery itself, probes);
    auto: only with hardware verification evidence for the current
    kernel sources. Off is a performance fallback (overflow patches in
    whole sub-tiles), never a correctness change.
    """
    env = os.environ.get("ILR_PIXEL_PATCH")
    if env in ("0", "1"):
        return env == "1"
    return vpx_verified()


_rescue_override = None  # None = auto; True/False from --rescue on|off


def set_rescue_override(value) -> None:
    """CLI --rescue on|off|auto -> True|False|None."""
    global _rescue_override
    _rescue_override = value


def rescue_enabled() -> bool:
    """Should the pipeline/bench enable the pass-2 rescue launch?

    Precedence: the CLI ``--rescue on|off`` override, then
    ``ILR_RESCUE=1``/``0`` (e.g. the verification battery itself),
    then auto: on only with hardware verification evidence for the
    current kernel sources.
    """
    if _rescue_override is not None:
        return bool(_rescue_override)
    env = os.environ.get("ILR_RESCUE")
    if env in ("0", "1"):
        return env == "1"
    return rescue_verified()
