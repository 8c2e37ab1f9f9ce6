#!/bin/sh
# Chip battery (round 5d): bound the 4-channel lane-packing lever.
#
# VERDICT r4 #6 asks for a measured cfg4 kernel-only improvement from
# lane-packing RGBZ tiles, or a probe-backed dead-end/ceiling entry.
# cfg4's bill is patch-bound (kernel/rest 1.4 of 11.9 ns/px), so the
# honest first step is to MEASURE the channel share of the kernel-only
# rate: cfg4 at z=1 (bad mask zeroed — timing-only) with the channel
# count overridden to 3/4/5 at the same tiling. The c=3 vs c=4 delta
# IS the per-channel cost lane packing could at best recover (packing
# shares index math across channels; it cannot beat the c-invariant
# floor). Also probes cfg2 z=1 c=3 vs c=4 for a second anchor.
#
# Waits for DONE_r5c so it never shares the chip with the r5c battery.
#
# Launch detached: nohup sh bench/recovery_watch_r5d.sh >/tmp/recovery_r5d.log 2>&1 &
# Results: bench/recovery_out/chan_r5d.log, DONE_r5d at the end.

set -u
cd /root/repo
OUT=/root/repo/bench/recovery_out
mkdir -p "$OUT"

note() {
    echo "$(date -u +%FT%TZ) $*" >> "$OUT/watch_r5d.log"
}

alive() {
    timeout 300 python -c "
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((8, 128))
y = (x * 2).sum()
assert float(np.asarray(y)) == 2048.0
" >/dev/null 2>&1
}

note "watcher start (pid $$) — waiting for DONE_r5c"
while [ ! -f "$OUT/DONE_r5c" ]; do
    sleep 60
done
note "r5c complete — probing device"
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
    timeout 2700 "$@" > "$OUT/${name}_r5d.log" 2>&1
    rc=$?
    note "step $name rc=$rc"
    return $rc
}

# cfg4 kernel-only channel scaling (z=1 timing-only; c overrides C):
run chan4 python bench/cfg_probe.py 4 \
    16:1:16:32:256:1 \
    16:1:16:32:256:1:0:0:0:0:3 \
    16:1:16:32:256:1:0:0:0:0:5
# cfg2 anchor (default C=3 vs C=4):
run chan2 python bench/cfg_probe.py 2 \
    24:3:40:32:256:1 \
    24:3:40:32:256:1:0:0:0:0:4

touch "$OUT/DONE_r5d"
note "battery complete"
