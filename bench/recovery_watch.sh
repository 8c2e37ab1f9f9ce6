#!/bin/sh
# Chip-recovery watcher + measurement battery (round 4, post-ww2).
#
# The axon backend has TWO failure modes (CLAUDE.md env hazards):
#   1. relay down — HTTP probe returns 000;
#   2. claim wedged — the relay still answers (405) but every device op
#      hangs in backend init with ~0 CPU. An HTTP probe cannot see this,
#      so the watcher's liveness check is a REAL device op + fetch with
#      a timeout.
#
# On recovery it runs, in order:
#   1. verify_onchip — attests the merged ww2 + rescue kernel sources,
#      writes the fresh .onchip_verified.json marker that lets the
#      planner pick ww2 and the pipeline enable rescue
#   2. bench.py — headline (the planner now picks ww2 (64,1,16,-17)
#      with the fresh marker; compare vs the 1441 scan measurement)
#   3. cfg_probe 3 — explicit ww2-vs-scan on the headline config
#   4. cfg_probe 2 / 4 — zero-bad / rescue-off / rescue-on triples at
#      the plan tilings for the cost-constant fit
#   5. fit_costs — derive _PATCH_NS_PER_PX / _RESCUE_NS_PER_PX
#
# Launch detached:  nohup sh bench/recovery_watch.sh >/tmp/recovery.log 2>&1 &
# Progress/results: bench/recovery_out/*.log, DONE marker at the end.

set -u
cd /root/repo
OUT=/root/repo/bench/recovery_out
mkdir -p "$OUT"

note() {
    echo "$(date -u +%FT%TZ) $*" >> "$OUT/watch.log"
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
    timeout 2700 "$@" > "$OUT/$name.log" 2>&1
    rc=$?
    note "step $name rc=$rc"
    return $rc
}

run verify  python bench/verify_onchip.py
run bench   python bench.py
run cfg3ww2 python bench/cfg_probe.py 3 \
    64:1:16:-17:256 48:1:16:32:256 64:1:16:-18:256 48:1:16:-17:256
run cfg2fit python bench/cfg_probe.py 2 \
    24:3:40:32:256:1 24:3:40:32:256:0:0 24:3:40:32:256:0:1:12:6
run cfg4fit python bench/cfg_probe.py 4 \
    16:1:16:32:256:1 16:1:16:32:256:0:0 16:1:16:32:256:0:1:12:6
run fit     python bench/fit_costs.py "$OUT/cfg2fit.log" "$OUT/cfg4fit.log"

touch "$OUT/DONE"
note "battery complete"
