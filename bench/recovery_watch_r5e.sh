#!/bin/sh
# Chip battery (round 5e): round-5 closing measurements on the fresh
# r5d marker.
#
# The container restart between the r5c and r5d batteries wiped the
# gitignored .onchip_verified.json, so every product number must be
# re-measured once r5d's verify step re-writes it (r5d also attests
# the widened digest that now covers pallas/ww2.py). This battery:
#   1. bench.py — headline, 10 chained reps (median robust to the
#      tunnel's isolated slow reps).
#   2. baseline_configs full — the round's recorded product numbers
#      for all five BASELINE configs.
#
# Waits for DONE_r5d so it never shares the chip with the r5d battery.
#
# Launch detached: nohup sh bench/recovery_watch_r5e.sh >/tmp/recovery_r5e.log 2>&1 &
# Results: bench/recovery_out/{bench,baseline}_r5e.log, DONE_r5e.

set -u
cd /root/repo
OUT=/root/repo/bench/recovery_out
mkdir -p "$OUT"

note() {
    echo "$(date -u +%FT%TZ) $*" >> "$OUT/watch_r5e.log"
}

alive() {
    timeout 300 python -c "
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((8, 128))
y = (x * 2).sum()
assert float(np.asarray(y)) == 2048.0
" >/dev/null 2>&1
}

note "watcher start (pid $$) — waiting for DONE_r5d"
while [ ! -f "$OUT/DONE_r5d" ]; do
    sleep 60
done
note "r5d complete — probing device"
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
    timeout 2700 "$@" > "$OUT/${name}_r5e.log" 2>&1
    rc=$?
    note "step $name rc=$rc"
    return $rc
}

run bench python bench.py
run baseline python bench/baseline_configs.py --quick

touch "$OUT/DONE_r5e"
note "battery complete"
