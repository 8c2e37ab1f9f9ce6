"""Benchmark harness: 4K equirect -> rectilinear remap throughput (Mpix/s/chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mpix/s", "vs_baseline": N, ...}

The headline config (BASELINE.json): full-360 equirectangular 3840x1920
source -> 3840x2160 rectilinear output, bicubic interpolation with fused
exposure + extended-Reinhard tonemap, float32, single chip. vs_baseline is
the ratio against the driver-set 2000 Mpix/s/chip target (the reference
publishes no numbers — BASELINE.md).

Methodology, hardened for high-latency device transports (the tunnel's
first device->host fetch performs a multi-minute claim handshake and each
subsequent fetch costs ~0.5 s; async dispatch makes block_until_ready
unreliable as a sync point):
* every iteration is data-dependent on the previous one (a scalar derived
  from the last output perturbs the next input), so iterations cannot be
  elided or overlapped by caching layers;
* each timed repetition closes with a small device->host fetch — the only
  sync every transport honors — and the separately-measured fetch
  round-trip overhead is subtracted;
* a watchdog thread bounds all fetches so a wedged transport produces a
  diagnostic JSON line instead of a hang.
"""

from __future__ import annotations

import json
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np

TARGET_MPIX_S = 2000.0
SRC_H, SRC_W = 1920, 3840
OUT_H, OUT_W = 2160, 3840
INTERP = "bicubic"
REPS = 10  # median of 9 steady reps: r5b saw isolated 3x-slow reps from
# transport contention on the shared tunnel; the median stays honest and
# needs >4 contended reps to move (all reps are recorded in the JSON)
ITERS_PER_REP = 50
FIRST_FETCH_TIMEOUT_S = 900.0
FETCH_TIMEOUT_S = 120.0

# --smoke: validate the harness end to end without a chip (CPU backend,
# interpret kernels, 16x-shrunk shapes, 1 iteration). Numbers are
# meaningless; exists so a relay-recovery battery never runs an
# untested harness. The driver's bare `python bench.py` is unaffected.
SMOKE = "--smoke" in sys.argv
if SMOKE:
    SRC_H, SRC_W = SRC_H // 16, SRC_W // 16
    OUT_H, OUT_W = OUT_H // 16, OUT_W // 16
    REPS, ITERS_PER_REP = 2, 1


def _fetch_with_timeout(arr, timeout_s: float):
    result = {}

    def work():
        try:
            result["value"] = np.asarray(arr)
        except Exception as e:  # pragma: no cover
            result["error"] = repr(e)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return False, None
    if "error" in result:
        return False, result["error"]
    return True, result["value"]


def main() -> int:
    import jax

    if SMOKE:
        import os

        os.environ.setdefault("ILR_RESCUE", "1")
        jax.config.update("jax_platforms", "cpu")
        from image_lens_reproject_tpu.ops.pallas import remap_kernel as _rk

        _rk.set_interpret(True)
    import jax.numpy as jnp

    from image_lens_reproject_tpu.models.lens import Rectilinear, full_equirectangular
    from image_lens_reproject_tpu.models.rotation import rotation_matrix_degrees
    from image_lens_reproject_tpu.ops import remap_fused

    # The axon relay can be down (CLAUDE.md hazards), in which case
    # backend init either raises or HANGS for ~20 min in a retry loop:
    # watchdog it and emit a diagnostic JSON line instead of a crash.
    init = {}

    def _init():
        try:
            init["dev"] = jax.devices()[0]
        except Exception as e:
            init["error"] = repr(e)

    t = threading.Thread(target=_init, daemon=True)
    t.start()
    t.join(600.0)
    if "dev" not in init:
        # Nonzero rc + explicit status: downstream tooling must not
        # ingest this diagnostic line as a real zero-throughput sample.
        print(json.dumps({
            "metric": "4K equirect->rectilinear bicubic+tonemap remap throughput",
            "value": 0.0,
            "unit": "Mpix/s",
            "vs_baseline": 0.0,
            "status": "skipped_no_device",
            "error": init.get(
                "error", "device backend init timed out (relay down?)"
            ),
        }))
        return 3
    dev = init["dev"]
    platform = dev.platform

    in_lens = full_equirectangular()
    out_lens = Rectilinear(35.0, 36.0, 36.0 * OUT_H / OUT_W)

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(0, 2, size=(SRC_H, SRC_W, 3)).astype(np.float32))
    rot = jnp.asarray(rotation_matrix_degrees(20.0, 5.0, 0.0))

    from image_lens_reproject_tpu.ops.pallas import remap_kernel

    # Rescue only with on-chip verification evidence for the current
    # kernel sources (dispatch.rescue_enabled; the headline usually has
    # 0 rescuable sub-tiles either way); the tiling pick models only
    # what the runtime will do.
    from image_lens_reproject_tpu.ops import dispatch

    use_rescue = dispatch.rescue_enabled()
    use_pixel_patch = dispatch.pixel_patch_enabled()
    tile_rows, n_groups, rb, scan_unroll, cb = remap_kernel.suggest_tiling(
        in_lens, out_lens, SRC_H, SRC_W, OUT_H, OUT_W, np.asarray(rot), INTERP,
        with_rescue=use_rescue,
    )
    # The prepass depends only on the config; a frame stream computes it
    # once (pipeline directory mode does the same via its plan cache).
    scalars, bad, rescue, rescue_cap, budgets, valid_px = remap_fused.plan_with_rescue(
        rot, use_rescue=use_rescue, pixel_patch=use_pixel_patch,
        in_lens=in_lens, out_lens=out_lens, in_h=SRC_H, in_w=SRC_W,
        out_h=OUT_H, out_w=OUT_W, interp=INTERP, n_samples=1,
        tile_rows=tile_rows, n_groups=n_groups, rb=rb, scan_unroll=scan_unroll,
        cb=cb,
    )
    n_resc = 0
    if rescue is not None:
        n_resc = int(np.asarray(jnp.sum(jnp.logical_and(bad, rescue[3] > 0))))

    @jax.jit
    def chain(src_, seed):
        # Perturb the input with a value derived from the previous output:
        # forces a true serial dependency across iterations.
        return remap_fused.remap_tonemap_planned(
            src_ + seed * jnp.float32(1e-12),
            rot,
            scalars,
            bad,
            rescue,
            valid_px,
            rescue_cap=rescue_cap,
            rescue_budgets=budgets,
            in_lens=in_lens,
            out_lens=out_lens,
            out_h=OUT_H,
            out_w=OUT_W,
            interp=INTERP,
            n_samples=1,
            exposure=2.0,
            reinhard=4.0,
            tile_rows=tile_rows,
            n_groups=n_groups,
            rb=rb,
            scan_unroll=scan_unroll,
            cb=cb,
        )

    # Compile + first-fetch handshake (may take minutes on tunneled chips).
    out = chain(src, jnp.float32(0.0))
    ok, _ = _fetch_with_timeout(out[0, :1, 0], FIRST_FETCH_TIMEOUT_S)
    transfer_ok = bool(ok)

    # Per-fetch round-trip overhead (median of 3).
    overheads = []
    if transfer_ok:
        for _ in range(3):
            t0 = time.perf_counter()
            ok2, _ = _fetch_with_timeout(out[0, :1, 0], FETCH_TIMEOUT_S)
            if not ok2:
                transfer_ok = False
                break
            overheads.append(time.perf_counter() - t0)
    overhead = float(np.median(overheads)) if overheads else 0.0

    rates = []
    raw_rates = []
    for _ in range(REPS):
        seed = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(ITERS_PER_REP):
            out = chain(src, seed)
            seed = out[0, 0, 0]
        if transfer_ok:
            ok2, _ = _fetch_with_timeout(out[0, :1, 0], FETCH_TIMEOUT_S)
            transfer_ok = transfer_ok and ok2
        else:
            out.block_until_ready()
        dt = time.perf_counter() - t0
        pix = OUT_H * OUT_W * ITERS_PER_REP
        raw_rates.append(pix / dt / 1e6)
        rates.append(pix / max(dt - overhead, 1e-9) / 1e6)

    # Median of the steady-state reps (the first rep pays compile-adjacent
    # warmup); max-of-reps would be a generous statistic.
    steady = rates[1:] if len(rates) > 1 else rates
    value = float(np.median(steady))

    # On-chip exactness evidence for this round's artifact: a quick
    # kernel-vs-oracle check on a reduced battery (full battery:
    # bench/verify_onchip.py). Proves the kernel is exact on real hardware,
    # where interpret-mode CI cannot see Mosaic miscompiles.
    verify_ok, verify_p999 = _quick_verify()

    record = {
        "metric": "4K equirect->rectilinear bicubic+tonemap remap throughput",
        **({"smoke": True} if SMOKE else {}),
        "value": round(value, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(value / TARGET_MPIX_S, 3),
        "platform": platform,
        "out_resolution": [OUT_W, OUT_H],
        "interp": INTERP,
        "iters_per_rep": ITERS_PER_REP,
        "tile_rows": tile_rows,
        "n_groups": n_groups,
        "rb": rb,
        "scan_unroll": scan_unroll,
        "cb": cb,
        "rescued_subtiles": n_resc,
        "pixel_patch": valid_px is not None,
        "rescue_enabled": use_rescue,
        "rescue_budgets": list(budgets) if budgets else None,
        "reps_mpix_s": [round(r, 1) for r in rates],
        "raw_reps_mpix_s": [round(r, 1) for r in raw_rates],
        "fetch_overhead_s": round(overhead, 3),
        "d2h_transfer_ok": transfer_ok,
        "verify_ok": verify_ok,
        "verify_p999_err": verify_p999,
    }
    print(json.dumps(record))
    return 0


def _quick_verify():
    """Kernel-vs-oracle on-chip spot check (3 configs); (ok, worst p999)."""
    import math

    import jax.numpy as jnp

    from image_lens_reproject_tpu.models.lens import (
        FisheyeEquisolid, Rectilinear, full_equirectangular,
    )
    from image_lens_reproject_tpu.models.rotation import rotation_matrix_degrees
    from image_lens_reproject_tpu.ops.pallas import remap_kernel as RK
    from image_lens_reproject_tpu.utils import oracle

    RECT = Rectilinear(35.0, 36.0, 36.0)
    EQUISOLID = FisheyeEquisolid(15.0, math.pi, 36.0, 36.0)
    EQUIRECT = full_equirectangular()
    rot = rotation_matrix_degrees(15.0, 5.0, 0.0)
    rng = np.random.default_rng(7)

    def smooth(h, w):
        yy, xx = np.meshgrid(
            np.linspace(0, 1, h, dtype=np.float32),
            np.linspace(0, 1, w, dtype=np.float32), indexing="ij",
        )
        return np.stack(
            [0.5 + 0.45 * np.sin(4 * a * xx + 3 * b * yy + p)
             for a, b, p in rng.uniform(0.5, 2, (3, 3))], -1,
        ).astype(np.float32)

    cases = [
        (EQUIRECT, RECT, "bicubic", rot, (256, 512), (256, 256)),
        (EQUISOLID, EQUIRECT, "bilinear", rot, (256, 256), (128, 256)),
        (RECT, EQUISOLID, "bicubic", None, (256, 256), (256, 256)),
    ]
    worst = 0.0
    try:
        for il, ol, interp, r, (ih, iw), (oh, ow) in cases:
            src = smooth(ih, iw)
            tr, ng, rb, su, cbv = RK.suggest_tiling(il, ol, ih, iw, oh, ow, r, interp)
            got = np.asarray(RK.remap_pallas(
                jnp.asarray(src), None if r is None else jnp.asarray(r),
                in_lens=il, out_lens=ol, out_h=oh, out_w=ow, interp=interp,
                n_samples=1, tile_rows=tr, n_groups=ng, rb=rb, scan_unroll=su,
                cb=cbv,
            ))
            want = oracle.oracle_remap(
                src, r, in_lens=il, out_lens=ol,
                out_h=oh, out_w=ow, interp=interp, n_samples=1,
            )
            worst = max(worst, float(np.quantile(np.abs(got - want), 0.999)))
        return bool(worst < 1e-3), float(f"{worst:.3e}")
    except Exception:
        return False, -1.0


if __name__ == "__main__":
    sys.exit(main())
