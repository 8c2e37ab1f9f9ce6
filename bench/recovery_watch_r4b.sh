#!/bin/sh
# Chip-recovery watcher + measurement battery (round 4b, post cost-refit
# + tr=128 tall tiles).
#
# Liveness = a real device op + fetch under timeout (CLAUDE.md env
# hazards: the relay can answer HTTP while the device claim is wedged).
#
# On recovery, in order:
#   1. verify_onchip — the cost-refit + tr=128 edits invalidated the
#      old marker digest; this re-attests rescue + ww2 AND (new) the
#      tr=128 cases. If the T128 cases fail (Mosaic compile or pixels),
#      the marker still attests rescue/ww2 and the planner simply never
#      picks tr=128.
#   2. cfg_probe 3 ww2 tilings — tr=64 rb=16 (round-4 headline) vs
#      rb=32 (isolates the per-sub-tile ROLL HEIGHT cost the ww2 model
#      lacks) vs tr=128 rb=24/32 (the per-tile-share halving bet).
#   3. bench.py — headline with whatever the (now fully fitted) planner
#      picks; expect >= 2120 Mpix/s.
#   4. cfg_probe 2 — rescue at the refit (8,6) pick vs the measured
#      (12,6) round-4 numbers (101.7) and rescue-off (91.5).
#   5. cfg_probe 4 — rescue-off confirmation (the refit chooser now
#      disables rescue here; round-4 measured 83.7 off / 79.9 on).
#   6. baseline_configs (full, cfg5 at 6 frames for steady-state
#      overlap instead of the 2-frame edge-dominated --quick number).
#
# Launch detached: nohup sh bench/recovery_watch_r4b.sh >/tmp/recovery_r4b.log 2>&1 &
# Progress/results: bench/recovery_out/*_r4b.log, DONE_r4b at the end.

set -u
cd /root/repo
OUT=/root/repo/bench/recovery_out
mkdir -p "$OUT"

note() {
    echo "$(date -u +%FT%TZ) $*" >> "$OUT/watch_r4b.log"
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
    timeout 2700 "$@" > "$OUT/${name}_r4b.log" 2>&1
    rc=$?
    note "step $name rc=$rc"
    return $rc
}

run verify   python bench/verify_onchip.py
run cfg3t128 python bench/cfg_probe.py 3 \
    64:1:16:-17:256 64:1:32:-17:256 128:1:24:-17:256 128:1:32:-17:256
run bench    python bench.py
run cfg2refit python bench/cfg_probe.py 2 \
    24:3:40:32:256:0:1:8:6 24:3:40:32:256:0:1:12:6
run cfg4refit python bench/cfg_probe.py 4 \
    16:1:16:32:256:0:0 16:1:16:32:256:0:1:8:6
run baseline python bench/baseline_configs.py

touch "$OUT/DONE_r4b"
note "battery complete"
