"""Benchmark harness: 4K equirect -> rectilinear remap throughput (Mpix/s/chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mpix/s", "vs_baseline": N, ...}

The headline config (BASELINE.json): full-360 equirectangular 3840x1920
source -> 3840x2160 rectilinear output, bicubic interpolation with fused
exposure + extended-Reinhard tonemap, float32, single chip. vs_baseline is
the ratio against the driver-set 2000 Mpix/s/chip target (the reference
publishes no numbers — BASELINE.md).

Methodology: jit-compile once, warm up, then time R repetitions of K
chained dispatches, closing each repetition with a block_until_ready and
a small device->host fetch (the fetch is the only sync some transports
honor). A watchdog thread bounds the fetch so a wedged transport yields a
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
REPS = 5
ITERS_PER_REP = 10


def _fetch_with_timeout(arr, timeout_s: float):
    """np.asarray(arr[...]) bounded by a watchdog; returns (ok, value)."""
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
    import jax.numpy as jnp

    from image_lens_reproject_tpu.models.lens import Rectilinear, full_equirectangular
    from image_lens_reproject_tpu.models.rotation import rotation_matrix_degrees
    from image_lens_reproject_tpu.ops import remap_fused

    dev = jax.devices()[0]
    platform = dev.platform

    in_lens = full_equirectangular()
    out_lens = Rectilinear(35.0, 36.0, 36.0 * OUT_H / OUT_W)

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(0, 2, size=(SRC_H, SRC_W, 3)).astype(np.float32))
    rot = jnp.asarray(rotation_matrix_degrees(20.0, 5.0, 0.0))

    def step(x):
        return remap_fused.remap_tonemap(
            x,
            rot,
            in_lens=in_lens,
            out_lens=out_lens,
            out_h=OUT_H,
            out_w=OUT_W,
            interp=INTERP,
            n_samples=1,
            exposure=2.0,
            reinhard=4.0,
        )

    # Compile + warmup.
    out = step(src)
    out.block_until_ready()
    ok, probe = _fetch_with_timeout(out[:1, :8, 0], 120.0)
    transfer_ok = bool(ok)

    rates = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(ITERS_PER_REP):
            out = step(src)
        out.block_until_ready()
        if transfer_ok:
            ok2, _ = _fetch_with_timeout(out[:1, :8, 0], 60.0)
            transfer_ok = transfer_ok and ok2
        dt = time.perf_counter() - t0
        rates.append(OUT_H * OUT_W * ITERS_PER_REP / dt / 1e6)

    value = float(max(rates))
    record = {
        "metric": "4K equirect->rectilinear bicubic+tonemap remap throughput",
        "value": round(value, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(value / TARGET_MPIX_S, 3),
        "platform": platform,
        "out_resolution": [OUT_W, OUT_H],
        "interp": INTERP,
        "reps_mpix_s": [round(r, 1) for r in rates],
        "d2h_transfer_ok": transfer_ok,
    }
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
