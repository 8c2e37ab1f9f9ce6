"""Pallas TPU fused remap kernel (performance path) — placeholder gate.

The kernel fuses coordinate generation, gather-interpolation from
VMEM-resident source tiles and tonemap over output tiles. Until the
kernel lands, ``supported`` returns False everywhere and the pure-XLA
path (ops/remap.py) serves all requests.
"""

from __future__ import annotations


def supported(src, in_lens, out_lens, interp, n_samples) -> bool:
    return False


def remap_pallas(*args, **kwargs):  # pragma: no cover
    raise NotImplementedError("Pallas remap kernel not yet available")
