#!/bin/sh
# Chip battery (round 5, post pixel-granular-patch wiring + ww2 rb fit).
#
# Liveness = a real device op + fetch under timeout (CLAUDE.md env
# hazards: the relay can answer HTTP while the device claim is wedged).
#
# On recovery, in order:
#   1. verify_onchip — the vpx wiring + ww2 refit changed the kernel
#      digest; re-attests rescue + ww2 + t128 AND (new) the three vpx
#      pixel-granular-patch cases. The marker now carries the battery
#      START digest (mid-run edits refuse the marker).
#   2. bench.py — headline with the refit pick (128,1,32); the measured
#      argmax was 2385.9 vs 2355.9 at the old (128,1,24) pick.
#   3. cfg2 probes at the product tiling (24:3:40:32:256):
#      a) p=1 r=0 — pixel patch only. Economics say this wins: 61% of
#         patched pixels were needlessly patched, and the measured
#         rescue costs 23.7 ns/rescued-px vs 28.7 * 0.39 = 11.2 for a
#         pixel-granular patch of the same sub-tiles.
#      b) p=1 r=1 — ladder rescue + pixel patch of the remainder.
#      (rescue-only 101.7 and rescue-off 91.5 are r4b-measured.)
#   4. cfg4 probes at (16:1:16:32:256): p=1 r=0 and p=1 r=1
#      (rescue-off 83.7 r4b-measured; 85% of its bad-sub-tile pixels
#      are truly invalid, so expect a smaller win).
#   5. rescue_launch_probe — decompose the 2.8 ms/launch fixed cost
#      (compaction vs kernel grid vs scatter) on cfg2's rescued set.
#   6. baseline_configs full — the product numbers with the marker's
#      vpx attestation auto-enabling pixel_patch plans.
#
# Launch detached: nohup sh bench/recovery_watch_r5.sh >/tmp/recovery_r5.log 2>&1 &
# Progress/results: bench/recovery_out/*_r5.log, DONE_r5 at the end.

set -u
cd /root/repo
OUT=/root/repo/bench/recovery_out
mkdir -p "$OUT"

note() {
    echo "$(date -u +%FT%TZ) $*" >> "$OUT/watch_r5.log"
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
    timeout 2700 "$@" > "$OUT/${name}_r5.log" 2>&1
    rc=$?
    note "step $name rc=$rc"
    return $rc
}

run verify   python bench/verify_onchip.py
run bench    python bench.py
run cfg2px   python bench/cfg_probe.py 2 \
    24:3:40:32:256:0:0:0:0:1 24:3:40:32:256:0:1:0:0:1
run cfg4px   python bench/cfg_probe.py 4 \
    16:1:16:32:256:0:0:0:0:1 16:1:16:32:256:0:1:0:0:1
if [ -f bench/rescue_launch_probe.py ]; then
    run rescueprof python bench/rescue_launch_probe.py
fi
run baseline python bench/baseline_configs.py

touch "$OUT/DONE_r5"
note "battery complete"
