"""Drift-corrected two-step-gather whole-window body ("ww2").

The original whole-window body (remap_kernel._make_kernel, gchunks
branch) loops over every window row and issues C*taps lane-gathers per
row behind a per-row y-weight mask — 8*C*taps gathers per ng=1 sub-tile
(bicubic C=3: 96), measured gather-bound (bench/op_model.py,
bench/gather_cost_probe.py). This body factors the per-pixel 2D gather
into:

  1. per (tap-offset k in [-1, taps], channel): ONE lane-dim
     take_along_axis over the whole (8, 128) window chunk, each window
     row j gathering at ITS OWN pixel-row x-base ``x0[j] + k`` — the
     (S, 128) lane-gather verified exact on hardware;
  2. per (y-tap n): ONE sublane-dim take_along_axis per gathered
     column set, selecting each output pixel's window row y_n;
  3. a per-pixel tap-axis shift ``d_n = x0 - x0[y_n]`` (2-deep select)
     correcting for the lane-gather's index having been evaluated at
     the selecting row instead of the output row.

Gathers per ng=1 sub-tile: C*(taps+2) lane + taps*(C*(taps+2) + 1)
sublane — bicubic C=3: 18 + 76 vs the row loop's 96 lane (plus its
per-row mask chains, which disappear).

EXACTNESS CONTRACT (enforced by the prepass admission,
remap_kernel._prepass ww2 criteria; violating sub-tiles are marked bad
and patched/rescued):

  * x-taps are CONSECUTIVE per pixel in monotonized window space:
    x_key[m] == x_key[0] + m (fails at trunc-toward-zero duplicates
    where sx in [0,1) and at clamp-collapsed borders — measured 0% of
    headline sub-tiles, 0.1% on BASELINE cfg1);
  * the per-column spread of x_key[0] across the sub-tile's 8 output
    rows is <= 1, so d_n in {-1, 0, +1} (measured 100% admissible on
    the headline and cfg1; polar-arc configs 2/4 stay on the scan
    body, which has no such constraint).

y-taps need no such contract: each y-tap's own window row field is
gathered directly (clamp-duplicated y taps just gather a row twice).

Verified: bench/ww2_probe.py (interpret + on-chip mechanics battery).
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp

Array = Any


def ww2_subtile(
    wfull: Array,           # (rows_w, GL) rolled window, rows_w = ng*8
    x0_w: Array,            # (8, TC) tap-0 window-column index (unscaled)
    y_rel: List[Array],     # per y-tap n: (8, TC) window-row index
    wx: List[Array],        # per x-tap m: (8, TC) weights
    wy: List[Array],        # per y-tap n: (8, TC) weights
    accs: List[Array],      # per channel: (8, TC) accumulators
    *,
    c_ch: int,
    n_taps: int,
    gchunks: int,
    rows_w: int,
) -> List[Array]:
    """Accumulate one sub-tile's interpolation into ``accs`` (returns new).

    ``wfull`` must already be rolled so the sub-tile's window starts at
    sublane 0 and lane 0 is the scan start (the caller does both rolls,
    exactly as for the row-loop body). ``x0_w`` is in window-COLUMN
    units (the caller's x_key[0]); lane indices are derived per channel
    as ``(x0_w + k) * c_ch + c``.
    """
    TC = x0_w.shape[1]
    GL = gchunks * 128

    # Per-tap-offset, per-channel lane gathers: window row j gathers at
    # its own x. Chunk chains exactly as the row-loop body.
    lks = []  # [k][c] -> (rows_w, TC)
    for k in range(-1, n_taps + 1):
        per_c = []
        for c in range(c_ch):
            xli = (x0_w + k) * c_ch + c
            # x0 lives on the sub-tile's 8 OUTPUT rows; window row j
            # gathers at x0[j mod 8] and the drift select compensates
            # (d_n is computed with the same j mod 8 convention).
            xli_w = xli if rows_w == 8 else jnp.concatenate(
                [xli] * (rows_w // 8), axis=0)
            got = jnp.take_along_axis(
                wfull[:, :128], jnp.clip(xli_w, 0, 127), axis=1)
            for q in range(1, gchunks):
                gq = jnp.take_along_axis(
                    wfull[:, q * 128:(q + 1) * 128],
                    jnp.clip(xli_w - q * 128, 0, 127), axis=1)
                got = jnp.where(xli_w >= q * 128, gq, got)
            per_c.append(got)
        lks.append(per_c)

    out = list(accs)
    for n in range(n_taps):
        yn = jnp.clip(y_rel[n], 0, rows_w - 1)
        if rows_w == 8:
            # drift of the output row's x vs the selecting row's x
            dn = x0_w - jnp.take_along_axis(x0_w, yn, axis=0)
            gk = [
                [jnp.take_along_axis(lks[k][c], yn, axis=0)
                 for c in range(c_ch)]
                for k in range(n_taps + 2)
            ]
        else:
            # ng > 1: group-select chain on the sublane gather (the
            # (8, L) primitive only reaches 8 sublanes at a time)
            def sub_gather(op):
                got = jnp.take_along_axis(op[:8], jnp.clip(yn, 0, 7), axis=0)
                for g in range(1, rows_w // 8):
                    gg = jnp.take_along_axis(
                        op[g * 8:(g + 1) * 8],
                        jnp.clip(yn - g * 8, 0, 7), axis=0)
                    got = jnp.where(yn >= g * 8, gg, got)
                return got

            # x0 lives on the OUTPUT 8-row grid, not window rows: the
            # lane gathers used x0[j mod 8] per window row, so the
            # drift uses the same convention.
            dn = x0_w - jnp.take_along_axis(
                x0_w, jnp.clip(yn % 8, 0, 7), axis=0)
            gk = [
                [sub_gather(lks[k][c]) for c in range(c_ch)]
                for k in range(n_taps + 2)
            ]
        # Weight-side drift selection: the gathered column gk[k] holds
        # tap offset k0 = k - 1, which is the pixel's tap m = k0 - d_n
        # (zero weight when m falls outside [0, taps)). Selecting on the
        # WEIGHT instead of the value shares the 2-deep chain across all
        # channels, and keeps the accumulation bitwise identical to the
        # value-side form: k = m + d_n is monotone in m per pixel, so
        # the same products are added in the same order (the out-of-
        # range slots add an exact +0).
        zero = jnp.zeros_like(wy[n])
        wxp = [zero] + list(wx) + [zero, zero]  # wxp[m + 1] = wx[m]
        for k in range(n_taps + 2):
            wk = jnp.where(
                dn == -1, wxp[k + 1],
                jnp.where(dn == 1, wxp[k - 1] if k >= 1 else zero, wxp[k]))
            wkn = wk * wy[n]
            for c in range(c_ch):
                out[c] = out[c] + gk[k][c] * wkn
    return out
