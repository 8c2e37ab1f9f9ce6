#!/bin/sh
# Chip battery (round 5b, post sorted/unique-scatter + joint chooser).
#
# The r5a battery measured the pixel-granular patch at 113 ns/px (cfg2)
# / 68 ns/px (cfg4) — 2.4-3.9x the block patch — with XLA lowering the
# per-pixel scatter as a serializing collision-safe combine. The kernel
# now rewrites nonzero's -1 fill slots into ascending out-of-grid rows
# so ALL overflow scatters (pixel, block, rescue landing) claim
# indices_are_sorted + unique_indices. This battery:
#   1. verify_onchip — the scatter rewrite changed the kernel digest;
#      re-attests rescue + ww2 + t128 + vpx on the new sources.
#   2. bench.py — headline must hold >= 2343 (scatter claims touch the
#      zero-bad path only via dead code; expect unchanged).
#   3. cfg2 probes at the product tiling (24:3:40:32:256), one JSON per
#      mode: block-only, rescue+block, px-only, rescue+px. Refits
#      _PATCH_NS_PER_PX (28.7) and _PX_PATCH_NS_PER_PX (113) to the
#      sorted-scatter lowering; the joint chooser then re-ranks.
#   4. cfg4 probes at (16:1:16:32:256): same four modes (85% of its
#      bad-sub-tile pixels truly invalid; px wins only under ~34 ns/px).
#   5. rescue_launch_probe cfg2 + cfg4 — cap sweep separating the fixed
#      per-launch cost (r4 fit: 2.8 ms, ~30% of cfg2's rescue bill and
#      cfg4's veto) from the per-px margin, on the sorted rescue landing.
#   6. baseline_configs full — product numbers under the fresh marker.
#
# Launch detached: nohup sh bench/recovery_watch_r5b.sh >/tmp/recovery_r5b.log 2>&1 &
# Progress/results: bench/recovery_out/*_r5b.log, DONE_r5b at the end.

set -u
cd /root/repo
OUT=/root/repo/bench/recovery_out
mkdir -p "$OUT"

note() {
    echo "$(date -u +%FT%TZ) $*" >> "$OUT/watch_r5b.log"
}

alive() {
    timeout 300 python -c "
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((8, 128))
print(float(np.asarray(jnp.sum(x))))" >/dev/null 2>&1
}

note "watcher start (pid $$) — device-op liveness probe"
while :; do
    if alive; then
        note "device op OK — battery begins"
        break
    fi
    note "device probe failed/hung"
    sleep 120
done

run() {
    name=$1; shift
    note "step $name start"
    timeout 2700 "$@" > "$OUT/${name}_r5b.log" 2>&1
    rc=$?
    note "step $name rc=$rc"
    return $rc
}

run verify   python bench/verify_onchip.py
run bench    python bench.py
# block-only, rescue+block, and the UNFORCED product plan (p=1 — the
# joint chooser decides; the JSON's pixel_patch field records it):
run cfg2     python bench/cfg_probe.py 2 \
    24:3:40:32:256 24:3:40:32:256:0:1 24:3:40:32:256:0:1:0:0:1
run cfg4     python bench/cfg_probe.py 4 \
    16:1:16:32:256 16:1:16:32:256:0:1 16:1:16:32:256:0:1:0:0:1
# px-only with admission FORCED (measures the sorted-scatter px cost;
# without the force the fitted 113 ns/px constant rejects the list and
# the probe would silently time the block path):
note "cfg2px/cfg4px run with ILR_PROBE_FORCE_PX=1"
run cfg2px env ILR_PROBE_FORCE_PX=1 python bench/cfg_probe.py 2 \
    24:3:40:32:256:0:0:0:0:1
run cfg4px env ILR_PROBE_FORCE_PX=1 python bench/cfg_probe.py 4 \
    16:1:16:32:256:0:0:0:0:1
run rescueprof2 python bench/rescue_launch_probe.py 2
run rescueprof4 python bench/rescue_launch_probe.py 4
run baseline python bench/baseline_configs.py

touch "$OUT/DONE_r5b"
note "battery complete"
