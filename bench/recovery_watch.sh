#!/bin/sh
# Relay-recovery watcher + round-4 measurement battery.
#
# The axon relay (127.0.0.1:8093) is externally managed and dies for
# hours at a time (CLAUDE.md env hazards). This script polls it and, on
# recovery, fires the full round-4 battery in dependency order:
#
#   1. verify_onchip      — post-rescue hardware exactness; writes
#                           .onchip_verified.json which GATES rescue for
#                           every later step (ops/dispatch.py)
#   2. bench.py           — headline (BENCH-grade JSON line)
#   3. baseline_configs   — all five BASELINE configs, rescue enabled
#   4. rescue_vmem_probe  — compile-feasibility grid for rescue budgets
#   5. cfg_probe 2 / 4    — zero-bad / rescue-off / rescue-on triples at
#                           the plan-chosen tilings (cfg2 24:3:40:32:256,
#                           cfg4 16:1:16:32:256, budgets 12:6) for the
#                           cost-constant fit
#   6. fit_costs          — derive _PATCH_NS_PER_PX/_RESCUE_NS_PER_PX
#   7. ww_sweep           — whole-window + tall-tile headline candidates
#
# Launch detached:  nohup sh bench/recovery_watch.sh >/tmp/recovery.log 2>&1 &
# Progress/results: bench/recovery_out/*.log, DONE marker at the end.

set -u
cd /root/repo
OUT=/root/repo/bench/recovery_out
mkdir -p "$OUT"
URL=http://127.0.0.1:8093/remote_compile

probe() {
    curl -s -o /dev/null -w "%{http_code}" --max-time 5 "$URL" 2>/dev/null
}

note() {
    echo "$(date -u +%FT%TZ) $*" >> "$OUT/watch.log"
}

note "watcher start (pid $$)"
while :; do
    code=$(probe)
    note "relay=$code"
    if [ "$code" != "000" ]; then
        # Debounce: require a second success 20 s later so a flapping
        # relay doesn't burn the one-shot battery on a dying backend.
        sleep 20
        code2=$(probe)
        note "relay-confirm=$code2"
        [ "$code2" != "000" ] && break
    fi
    sleep 45
done
note "relay up — battery begins"

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
run baseline python bench/baseline_configs.py --quick
run cfg2fit python bench/cfg_probe.py 2 \
    24:3:40:32:256:1 24:3:40:32:256:0:0 24:3:40:32:256:0:1:12:6
run cfg4fit python bench/cfg_probe.py 4 \
    16:1:16:32:256:1 16:1:16:32:256:0:0 16:1:16:32:256:0:1:12:6
run fit     python bench/fit_costs.py "$OUT/cfg2fit.log" "$OUT/cfg4fit.log"
run ww      python bench/ww_sweep.py \
    48:1:24:-1:512 64:1:24:-1:512 48:1:24:32:512 64:1:16:32:512 48:1:40:32:256

touch "$OUT/DONE"
note "battery complete"
