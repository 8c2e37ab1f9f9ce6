"""bench/fit_costs.py: constant derivation from cfg_probe JSON lines."""

import json
import subprocess
import sys


def run_fit(tmp_path, lines):
    log = tmp_path / "probe.log"
    log.write_text("\n".join(json.dumps(r) for r in lines) + "\n")
    out = subprocess.run(
        [sys.executable, "bench/fit_costs.py", str(log)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    return [json.loads(l) for l in out.stdout.splitlines()]


def _rec(cfg, mpix, frac_bad, cap=0, rescued=0, budgets=None):
    return {
        "cfg": cfg, "tile_rows": 16, "n_groups": 1, "rb": 16,
        "scan_unroll": 32, "cb": 256, "mpix_s": mpix,
        "frac_bad_subtiles": frac_bad, "rescue_cap": cap,
        "rescued_subtiles": rescued, "rescue_budgets": budgets,
    }


def test_patch_and_rescue_fit(tmp_path):
    # Synthetic cfg4 (2048x2048 out): zero-bad at 500 Mpix/s (2 ns/px),
    # plain with 25% bad at 125 Mpix/s (8 ns/px) -> patch = 24 ns/px.
    # Rescue-on moving half the bad (12.5% of px = 512 sub-tiles) up to
    # 160 Mpix/s (6.25 ns/px) -> rescue = 24 - (8-6.25)/0.125 = 10 ns/px.
    lines = [
        _rec(4, 125.0, 0.25),
        _rec(4, 500.0, 0.0),
        _rec(4, 160.0, 0.25, cap=512, rescued=512, budgets=[12, 6]),
    ]
    res = run_fit(tmp_path, lines)
    patch = next(r for r in res if r["constant"] == "_PATCH_NS_PER_PX")
    assert abs(patch["value"] - 24.0) < 0.1
    resc = next(r for r in res if r["constant"] == "_RESCUE_NS_PER_PX")
    assert abs(resc["value"] - 10.0) < 0.1
    assert resc["budgets"] == [12, 6]


def test_no_pairs_reports_error(tmp_path):
    res = run_fit(tmp_path, [_rec(2, 100.0, 0.2)])
    assert any("error" in r for r in res)
