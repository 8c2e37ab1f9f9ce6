"""Kernel-path dispatch: Pallas fused kernel vs pure-XLA remap.

The framework has two device implementations of the remap:

* the pure-XLA path (ops/remap.py) — the always-correct reference path,
  runs on any backend (CPU tests, TPU);
* the Pallas fused kernel (ops/pallas/remap_kernel.py) — the performance
  path on TPU, fusing coordinate generation, gather-interpolation and
  tonemap over VMEM tiles.

Selection: Pallas is used automatically on TPU backends when the
(lens, interp) combination is supported by the kernel; force the pure-XLA
path with ``set_pure_xla(True)`` or the CLI ``--pure-xla`` flag.
"""

from __future__ import annotations

_pure_xla = False


def set_pure_xla(value: bool) -> None:
    global _pure_xla
    _pure_xla = bool(value)


def pure_xla_forced() -> bool:
    return _pure_xla
