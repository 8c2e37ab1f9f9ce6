"""Prototype + micro-verifier for the two-step-gather whole-window body.

The current whole-window body (remap_kernel._make_kernel, gchunks
branch) loops over the ng*8 window rows and issues C*taps lane-gathers
per row, masked by a per-row y-weight chain — 8*C*taps gathers per
8x128 sub-tile at ng=1. Its measured cost is gather-bound (op_model:
~5x an average vector op), which is why it only ties the scan body.

This variant factors the 2D gather into TWO hardware-verified
primitives, indexed per OUTPUT pixel:

  1. per (x-tap m, channel c, chunk q): ONE lane-dim take_along_axis on
     the (8, 128) window chunk (sublane j = window row j), idx = the
     pixel's window-column xli[m] + c — same index for every sublane,
     exact on hardware for (S, 128) operands;
  2. per (y-tap n): ONE sublane-dim take_along_axis (axis=0, (8, L)
     operand) with the pixel's window-row y_rel[n] — reusing the
     lane-gathered value across all y-taps.

Gathers per ng=1 sub-tile drop 8*C*taps -> C*taps*(1 + taps_y_reuse):
bicubic C=3: 96 -> 60; bilinear C=3: 48 -> 18; and the per-row mask
chain disappears.

Usage:  python bench/ww2_probe.py            # real chip: exactness
        python bench/ww2_probe.py --interpret # CPU interpret mode
Prints one JSON line per case {name, max_err, ok}.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

INTERPRET = "--interpret" in sys.argv


def main() -> int:
    import jax

    if INTERPRET:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(7)

    def run_case(name, n_sub, gchunks, taps, c_ch, ng=1):
        """Window (ng*8, gchunks*128) per sub-tile; per-pixel taps."""
        TC = 128
        GL = gchunks * 128
        rows_w = ng * 8
        win = rng.uniform(0, 1, (n_sub, rows_w, GL)).astype(np.float32)
        # per-pixel window coords: y in [0, rows_w-taps], x base so that
        # all taps stay in [0, GL/c_ch - 1] columns (idx scaled by c_ch)
        cols_w = GL // c_ch
        y0 = rng.integers(0, rows_w - taps + 1, (n_sub, 8, TC)).astype(np.int32)
        # x-tap indices must be ROW-INVARIANT within a sub-tile for the
        # two-step composition to be exact (the lane-gather's index is
        # evaluated at the selecting window row, not the output row) —
        # the production integration must prepass-check this or carry a
        # +-drift tap correction; here the data satisfies it.
        x0 = np.broadcast_to(
            rng.integers(0, cols_w - taps + 1, (n_sub, 1, TC)),
            (n_sub, 8, TC)).astype(np.int32).copy()
        wx = rng.uniform(-0.4, 1.0, (taps, n_sub, 8, TC)).astype(np.float32)
        wy = rng.uniform(-0.4, 1.0, (taps, n_sub, 8, TC)).astype(np.float32)

        # reference: out[c][s,r,p] = sum_{m,n} wx[m] wy[n] win[s, y0+n, (x0+m)*c_ch + c]
        want = np.zeros((c_ch, n_sub, 8, TC), np.float32)
        for s in range(n_sub):
            for n in range(taps):
                for m in range(taps):
                    w = wx[m, s] * wy[n, s]
                    gy = y0[s] + n
                    gx = x0[s] + m
                    for c in range(c_ch):
                        want[c, s] += w * win[s, gy, gx * c_ch + c]

        def kernel(win_ref, y0_ref, x0_ref, wx_ref, wy_ref, out_ref):
            for s in range(n_sub):
                for c in range(c_ch):
                    acc = jnp.zeros((8, TC), jnp.float32)
                    for m in range(taps):
                        xli = (x0_ref[s] + m) * c_ch + c
                        # lane-gather per chunk + chain; then reuse
                        # across ALL y-taps
                        lm = None  # (rows_w, TC): window rows x out-cols
                        for g in range(ng):
                            # build (8, TC) per window 8-row group by
                            # gathering each chunk then chain-selecting
                            op = win_ref[s, g * 8:(g + 1) * 8, :]
                            got = jnp.take_along_axis(
                                op[:, :128], jnp.clip(xli, 0, 127), axis=1)
                            for q in range(1, gchunks):
                                gq = jnp.take_along_axis(
                                    op[:, q * 128:(q + 1) * 128],
                                    jnp.clip(xli - q * 128, 0, 127), axis=1)
                                got = jnp.where(xli >= q * 128, gq, got)
                            lm = got if lm is None else jnp.concatenate(
                                [lm, got], 0)
                        for n in range(taps):
                            yr = jnp.clip(y0_ref[s] + n, 0, rows_w - 1)
                            if ng == 1:
                                gn = jnp.take_along_axis(lm, yr, axis=0)
                            else:
                                # group-select chain on the y side
                                gn = jnp.take_along_axis(
                                    lm[:8], jnp.clip(yr, 0, 7), axis=0)
                                for g in range(1, ng):
                                    gg = jnp.take_along_axis(
                                        lm[g * 8:(g + 1) * 8],
                                        jnp.clip(yr - g * 8, 0, 7), axis=0)
                                    gn = jnp.where(yr >= g * 8, gg, gn)
                            acc = acc + gn * (wx_ref[m, s] * wy_ref[n, s])
                    out_ref[c, s] = acc

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((c_ch, n_sub, 8, TC), jnp.float32),
            interpret=INTERPRET,
        )(jnp.asarray(win), jnp.asarray(y0), jnp.asarray(x0),
          jnp.asarray(wx), jnp.asarray(wy))
        err = float(np.abs(np.asarray(out) - want).max())
        rec = {"name": name, "max_err": err, "ok": err < 1e-5}
        print(json.dumps(rec), flush=True)
        return rec["ok"]

    def run_drift_case(name, n_sub, gchunks, taps, c_ch):
        """ng=1 variant with the +-1 drift-corrected tap axis.

        x-tap indices vary by at most +-1 across a sub-tile's 8 output
        rows (the measured headline case: integer-crossing columns).
        Gather taps k in [-1, taps] with each SELECTING row's own x,
        then per (m, n) shift the tap axis by d_n = x0 - x0[y_n] with a
        2-deep select chain. Exact for |d| <= 1 (prepass-admitted).
        """
        TC = 128
        GL = gchunks * 128
        win = rng.uniform(0, 1, (n_sub, 8, GL)).astype(np.float32)
        cols_w = GL // c_ch
        y0 = rng.integers(0, 8 - taps + 1, (n_sub, 8, TC)).astype(np.int32)
        # per-column max-min <= 1 (the prepass admission for D=1):
        # x0 in {base, base+1} per pixel
        base = rng.integers(1, cols_w - taps - 1, (n_sub, 1, TC))
        delta = rng.integers(0, 2, (n_sub, 8, TC))
        x0 = (base + delta).astype(np.int32)
        wx = rng.uniform(-0.4, 1.0, (taps, n_sub, 8, TC)).astype(np.float32)
        wy = rng.uniform(-0.4, 1.0, (taps, n_sub, 8, TC)).astype(np.float32)

        want = np.zeros((c_ch, n_sub, 8, TC), np.float32)
        for s in range(n_sub):
            for n in range(taps):
                for m in range(taps):
                    w = wx[m, s] * wy[n, s]
                    gy = y0[s] + n
                    gx = x0[s] + m
                    for c in range(c_ch):
                        want[c, s] += w * win[s, gy, gx * c_ch + c]

        def kernel(win_ref, y0_ref, x0_ref, wx_ref, wy_ref, out_ref):
            for s in range(n_sub):
                x0v = x0_ref[s]
                for c in range(c_ch):
                    # taps+2 lane-gathered columns, each row with its
                    # OWN x (k = -1 .. taps)
                    lks = []
                    for k in range(-1, taps + 1):
                        xli = (x0v + k) * c_ch + c
                        got = jnp.take_along_axis(
                            win_ref[s], jnp.clip(xli, 0, 127), axis=1
                        )[:, :128] if gchunks == 1 else None
                        if gchunks > 1:
                            got = jnp.take_along_axis(
                                win_ref[s, :, :128],
                                jnp.clip(xli, 0, 127), axis=1)
                            for q in range(1, gchunks):
                                gq = jnp.take_along_axis(
                                    win_ref[s, :, q * 128:(q + 1) * 128],
                                    jnp.clip(xli - q * 128, 0, 127), axis=1)
                                got = jnp.where(xli >= q * 128, gq, got)
                        lks.append(got)
                    acc = jnp.zeros((8, TC), jnp.float32)
                    for n in range(taps):
                        yn = jnp.clip(y0_ref[s] + n, 0, 7)
                        # drift of the OUTPUT row's x vs the selecting
                        # row's x (shared across channels/taps)
                        dn = x0v - jnp.take_along_axis(x0v, yn, axis=0)
                        gk = [jnp.take_along_axis(lks[k], yn, axis=0)
                              for k in range(taps + 2)]
                        for m in range(taps):
                            g = jnp.where(
                                dn == -1, gk[m],
                                jnp.where(dn == 1, gk[m + 2], gk[m + 1]))
                            acc = acc + g * (wx_ref[m, s] * wy_ref[n, s])
                    out_ref[c, s] = acc

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((c_ch, n_sub, 8, TC), jnp.float32),
            interpret=INTERPRET,
        )(jnp.asarray(win), jnp.asarray(y0), jnp.asarray(x0),
          jnp.asarray(wx), jnp.asarray(wy))
        err = float(np.abs(np.asarray(out) - want).max())
        rec = {"name": name, "max_err": err, "ok": err < 1e-5}
        print(json.dumps(rec), flush=True)
        return rec["ok"]

    ok = True
    ok &= run_case("bicubic C3 g1 ns4", 4, 1, 4, 3)
    ok &= run_case("bicubic C3 g2 ns4", 4, 2, 4, 3)
    ok &= run_case("bilinear C3 g1 ns2", 2, 1, 2, 3)
    ok &= run_case("bilinear C4 g2 ns2", 2, 2, 2, 4)
    ok &= run_case("bilinear C3 g2 ng2", 2, 2, 2, 3, ng=2)
    ok &= run_case("bicubic C3 g1 ng2", 2, 1, 4, 3, ng=2)
    ok &= run_drift_case("DRIFT bicubic C3 g1", 4, 1, 4, 3)
    ok &= run_drift_case("DRIFT bicubic C3 g2", 2, 2, 4, 3)
    ok &= run_drift_case("DRIFT bilinear C3 g1", 2, 1, 2, 3)
    ok &= run_drift_case("DRIFT bilinear C4 g2", 2, 2, 2, 4)
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
