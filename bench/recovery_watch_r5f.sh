#!/bin/sh
# Chip battery (round 5f): attest + measure the pass-2b SPLIT rescue.
#
# The split rescue (git: this commit) recomputes still-patched sub-tiles
# whose 8x64 halves BOTH fit per-piece windows under half the (ng, g)
# lane budget — the cluster-jump windows (seam monotonization, polar-arc
# reversals) that no contiguous whole-window covers. CPU-side probe
# (bench/overflow_split_probe.py): 60.6% of cfg2's patched set fits
# (8, 6) split where 0% fits it whole; modeled gain ~+14% cfg2 e2e.
# The kernel change (two per-piece DMAs into 4-D scratch, per-half
# lane/vertical rolls, lane-half-selected index bases) is new Mosaic
# surface — interpret mode cannot vouch for it, hence:
#   1. verify_onchip — 39 cases incl. 3 SPLIT cases; a PASS writes the
#      marker attesting the new digest (the split edits invalidated the
#      r5d marker; bench/baseline below need it back regardless).
#   2. cfg2 probes: rescue-on without and with split (s=1, the full
#      product plan path).
#   3. cfg4 probes: same pair (expected ~+2% at best: its fold-ring
#      windows stay frame-spanning at any granularity).
#   4. bench.py — headline (unaffected by split; re-records the driver
#      artifact on the final source state).
#   5. baseline_configs full — the round's product numbers with split
#      gated by the fresh marker.
#
# Waits for DONE_r5e so it never shares the chip with the r5e battery.
#
# Launch detached: nohup sh bench/recovery_watch_r5f.sh >/tmp/recovery_r5f.log 2>&1 &
# Results: bench/recovery_out/{verify,cfg2s,cfg4s,bench,baseline}_r5f.log, DONE_r5f.

set -u
cd /root/repo
OUT=/root/repo/bench/recovery_out
mkdir -p "$OUT"

note() {
    echo "$(date -u +%FT%TZ) $*" >> "$OUT/watch_r5f.log"
}

alive() {
    timeout 300 python -c "
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((8, 128))
y = (x * 2).sum()
assert float(np.asarray(y)) == 2048.0
" >/dev/null 2>&1
}

note "watcher start (pid $$) — waiting for DONE_r5e"
while [ ! -f "$OUT/DONE_r5e" ]; do
    sleep 60
done
note "r5e complete — probing device"
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
    timeout 3300 "$@" > "$OUT/${name}_r5f.log" 2>&1
    rc=$?
    note "step $name rc=$rc"
    return $rc
}

run verify python bench/verify_onchip.py
# cfg2 product tiling: rescue-on, then rescue-on + split (s=1).
run cfg2s python bench/cfg_probe.py 2 \
    24:3:40:32:256:0:1 \
    24:3:40:32:256:0:1:0:0:0:0:1
# cfg4 product tiling: same pair.
run cfg4s python bench/cfg_probe.py 4 \
    16:1:16:32:256:0:1 \
    16:1:16:32:256:0:1:0:0:0:0:1
run bench python bench.py
run baseline python bench/baseline_configs.py --quick

touch "$OUT/DONE_r5f"
note "battery complete"
