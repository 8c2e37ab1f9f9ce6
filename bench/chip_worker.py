"""Persistent TPU experiment worker (development tool).

The tunneled chip charges a multi-minute claim handshake per PROCESS;
iterating on kernel experiments from fresh processes wastes most of the
wall clock on re-claims. This worker pays it once and then executes job
files from a drop directory in-process:

    echo '<python source>' > /tmp/chip_jobs/my_job.py
    # worker runs it (exec) and writes /tmp/chip_jobs/my_job.out
    # (stdout + traceback); the job file is renamed .done

Jobs share the worker's module state via the JOBNS dict (e.g. keep
compiled functions across jobs). A job named `quit.py` stops the worker.
"""

from __future__ import annotations

import io
import contextlib
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, "/root/repo")

JOBS = Path("/tmp/chip_jobs")
JOBS.mkdir(exist_ok=True)

JOBNS: dict = {}


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    JOBNS.update(jax=jax, jnp=jnp, np=np)
    # Pay the claim handshake up front with a tiny round trip.
    t0 = time.perf_counter()
    val = np.asarray(jax.jit(lambda: jnp.ones(()) + 1)())
    print(f"worker ready: claim+first-fetch {time.perf_counter() - t0:.1f}s "
          f"(device {jax.devices()[0].platform})", flush=True)

    while True:
        jobs = sorted(p for p in JOBS.glob("*.py") if p.stem != "__pycache__")
        if not jobs:
            time.sleep(0.5)
            continue
        job = jobs[0]
        if job.stem == "quit":
            job.unlink()
            print("worker: quit", flush=True)
            return 0
        src = job.read_text()
        buf = io.StringIO()
        t0 = time.perf_counter()
        try:
            with contextlib.redirect_stdout(buf):
                exec(compile(src, str(job), "exec"), JOBNS)
            status = "ok"
        except Exception:
            buf.write(traceback.format_exc())
            status = "error"
        dt = time.perf_counter() - t0
        out = job.with_suffix(".out")
        out.write_text(buf.getvalue() + f"\n[{status} in {dt:.1f}s]\n")
        job.rename(job.with_suffix(".done"))
        print(f"ran {job.name}: {status} ({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
