#!/bin/sh
# Chip battery (round 5g, FINAL): attest the final round-5 sources.
#
# r5f results: the split-bl case verified EXACT on chip (p999 5.1e-7)
# and cfg2 measured 101.1 -> 110.4 Mpix/s with 796 split-rescued
# sub-tiles — but the bicubic split case was a Mosaic compile FAIL that
# burned the verify step into its timeout (rc=124, no marker). The
# sources now statically reject the infeasible region
# (remap_kernel.split_feasible: taps<=2, C<=3, probe-backed) and the
# battery's SPLIT cases cover only what the planner can emit. This
# battery:
#   1. verify_onchip — 38 cases; a PASS writes the marker attesting the
#      FINAL kernel digest incl. the split flag.
#   2. bench.py — the headline on the attested final sources (what the
#      round driver will reproduce).
#   3. baseline_configs full — the round's product numbers, cfg2 now
#      split-rescued via the fresh marker.
#
# Launch detached AFTER the orphaned r5f cfg4s probe exits:
#   nohup sh bench/recovery_watch_r5g.sh >/tmp/recovery_r5g.log 2>&1 &
# Results: bench/recovery_out/{verify,bench,baseline}_r5g.log, DONE_r5g.

set -u
cd /root/repo
OUT=/root/repo/bench/recovery_out
mkdir -p "$OUT"

note() {
    echo "$(date -u +%FT%TZ) $*" >> "$OUT/watch_r5g.log"
}

alive() {
    timeout 300 python -c "
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((8, 128))
y = (x * 2).sum()
assert float(np.asarray(y)) == 2048.0
" >/dev/null 2>&1
}

note "watcher start (pid $$)"
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
    timeout 3000 "$@" > "$OUT/${name}_r5g.log" 2>&1
    rc=$?
    note "step $name rc=$rc"
    return $rc
}

run verify python bench/verify_onchip.py
run bench python bench.py
run baseline python bench/baseline_configs.py --quick

touch "$OUT/DONE_r5g"
note "battery complete"
