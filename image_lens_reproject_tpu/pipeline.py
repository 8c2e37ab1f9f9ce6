"""Batch orchestrator: file discovery, host prefetch, device dispatch.

TPU-native re-design of the reference's CTPL thread-pool fan-out
(src/main.cpp:536-660). The reference runs the *whole* task (decode +
remap + encode) per image on a CPU worker thread; here the remap runs on
the TPU, so the pipeline becomes three overlapping stages:

    decode threads  ->  batched device remap (async dispatch)  ->  encode threads

Host decode/encode run on a ThreadPoolExecutor (the ``-j`` knob); device
work is enqueued asynchronously (JAX dispatch is non-blocking) so H2D
copies, compute and D2H overlap with host I/O — the TPU analog of the
reference's per-image parallelism, with the hot loop on the chip.

Parity-preserving behaviors (reference src/main.cpp:536-660):
* skip-if-exists checks ALL requested output formats before decoding;
* directory scan: regular files, sorted paths, prefix/suffix filter, only
  .exr/.png submitted (JPEG input only via --single);
* --no-reproject with scale == 1 bypasses the remap (plain copy);
* per-image try/except prints the error and continues the batch;
* atomic progress counter printed as "%4d / %4d: stem".
"""

from __future__ import annotations

import dataclasses
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from .io import exr as exr_io
from .io import jpeg as jpeg_io
from .io import png as png_io
from .io.image import ImageBuffer
from .models.lens import LensSpec
from .ops import color, dispatch, remap
from .utils.tracing import trace_zone


@dataclasses.dataclass
class PipelineOptions:
    input_lens: LensSpec
    output_lens: LensSpec
    out_width: int
    out_height: int
    interp: str = "bicubic"
    n_samples: int = 1
    rotation: Optional[np.ndarray] = None  # (3,3) float32 or None
    exposure: float = 1.0  # linear multiplier (2^EV)
    reinhard: float = 1.0
    store_png: bool = False
    store_exr: bool = False
    skip_if_exists: bool = False
    do_reproject: bool = True
    scale: float = 1.0
    num_threads: int = 1
    batch_size: int = 1  # images per device dispatch (framework extension)
    json_log: bool = False  # machine-readable progress lines (extension)
    device: object = None  # jax.Device or None for default
    # Multi-chip data parallelism (framework extension): "b,r" mesh shape
    # (batch x rows axes) or "auto" to use every visible device on the
    # batch axis when more than one is present; None disables.
    mesh: Optional[str] = None
    # Stage ordering (framework extension): "overlap" runs decode /
    # device dispatch / encode as overlapping stages across host threads
    # (the reference's thread-pool analog, src/main.cpp:536-660);
    # "serial" runs each frame decode->dispatch->encode to completion
    # before the next starts. Overlap measured 1.362x serial on the r5
    # tunnel battery (bench/recovery_out/baseline_r5.log) — but r4b
    # measured the OPPOSITE (0.824-0.986x) on the same serialized
    # ~40 MB/s link, so the faster order is transport-dependent; the
    # knob exposes the choice and stats/JSON record it rather than
    # auto-guessing from a noisy first-frame probe.
    ordering: str = "overlap"


def discover_files(
    input_dir: str, filter_prefix: str = "", filter_suffix: str = ""
) -> List[Path]:
    """Sorted, filtered directory listing (src/main.cpp:624-651)."""
    paths = sorted(p for p in Path(input_dir).iterdir() if p.is_file())
    out = []
    for p in paths:
        fn = p.name
        if len(fn) < len(filter_prefix) or len(fn) < len(filter_suffix):
            continue
        if filter_prefix and not fn.startswith(filter_prefix):
            continue
        if filter_suffix and not fn.endswith(filter_suffix):
            continue
        if p.suffix in (".exr", ".png"):
            out.append(p)
    return out


def read_image(path: Path) -> ImageBuffer:
    """Decode by extension (src/main.cpp:566-575)."""
    suffix = path.suffix.lower()
    if suffix == ".exr":
        return exr_io.read_exr(str(path))
    if suffix == ".png":
        return png_io.read_png(str(path))
    if suffix in (".jpeg", ".jpg"):
        return jpeg_io.read_jpeg(str(path))
    raise ValueError(f"Input format not supported: {path.suffix}")


class PipelineStats:
    """Progress/failure accounting + console contract (src/main.cpp:615-619).

    ``json_log=True`` switches progress lines to one-JSON-object-per-line
    (machine-readable observability; SURVEY.md §5.5 extension).
    """

    def __init__(self, json_log: bool = False):
        self.done = 0
        self.failed: List[str] = []
        self.pixels = 0
        self.wall_seconds = 0.0
        self.ordering = "overlap"  # set by run_pipeline from the options
        self.json_log = json_log
        self._lock = threading.Lock()

    def mark_done(self, count: int, stem: str, pixels: int = 0) -> int:
        with self._lock:
            self.done += 1
            self.pixels += pixels
            dc = self.done
        if self.json_log:
            import json as _json

            print(_json.dumps({"event": "done", "n": dc, "total": count, "file": stem}))
        else:
            print(f"{dc:4d} / {count:4d}: {stem}")
        return dc

    def mark_failed(self, name: str, err: Exception):
        with self._lock:
            self.failed.append(name)
        if self.json_log:
            import json as _json

            print(_json.dumps({"event": "error", "file": name, "message": str(err)}))
        else:
            print(f"Error: {err}")


def _output_paths(output_dir: Path, p: Path):
    base = output_dir / p.name
    return base.with_suffix(".png"), base.with_suffix(".exr")


def _outputs_exist(opts: PipelineOptions, out_png: Path, out_exr: Path) -> bool:
    """All requested formats already on disk? (src/main.cpp:551-563)."""
    exists = True
    if opts.store_png and not out_png.exists():
        exists = False
    if opts.store_exr and not out_exr.exists():
        exists = False
    return exists


def _resolve_mesh(opts: PipelineOptions):
    """Parse opts.mesh -> (batch_axis, rows_axis) or None.

    "auto" uses every visible device on the batch axis when >1 is present.
    Invalid shapes (more devices than present, indivisible row bands) fall
    back to single-device dispatch with a warning — never an error.
    """
    if not opts.mesh:
        return None
    import jax

    n_dev = len(jax.devices())
    if opts.mesh == "auto":
        return (n_dev, 1) if n_dev > 1 else None
    try:
        b_ax, r_ax = (int(x) for x in opts.mesh.split(","))
    except ValueError:
        print(f"Warning: bad --mesh '{opts.mesh}', expected B,R or auto")
        return None
    if b_ax * r_ax > n_dev or b_ax < 1 or r_ax < 1:
        print(f"Warning: --mesh {b_ax}x{r_ax} needs {b_ax * r_ax} devices, "
              f"have {n_dev}; using single-device dispatch")
        return None
    # Neither out_h nor in_h needs to divide the rows axis:
    # sharded_remap_step pads + crops the output bands, and process_batch
    # row-pads the source for sharding transport (sliced off post-gather).
    return b_ax, r_ax


# Two plan flavors share this cache (see process_batch):
#  (input shape, config)         -> (tile_rows, n_groups, rb, scan_unroll,
#                                    cb, scalars, bad, rescue, rescue_cap,
#                                    rescue_budgets)
#  ("mesh", mesh, shape, config) -> (tile_rows, n_groups, rb, scan_unroll,
#                                    cb, mesh_rescue_cap, rescue_budgets)
# reused across every frame of a directory run. LRU-bounded: plans hold
# device arrays, so a long-lived process hitting many keys must evict.
_PLAN_CACHE_MAX = 16
_PLAN_CACHE: "OrderedDict" = None  # initialized below


from collections import OrderedDict  # noqa: E402

_PLAN_CACHE = OrderedDict()


def _plan_cache_get(key):
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        _PLAN_CACHE.move_to_end(key)
    return cached


def _plan_cache_put(key, value):
    _PLAN_CACHE[key] = value
    _PLAN_CACHE.move_to_end(key)
    while len(_PLAN_CACHE) > _PLAN_CACHE_MAX:
        _PLAN_CACHE.popitem(last=False)


def _log_plan(opts: PipelineOptions, tiling, shape) -> None:
    """--json-log observability: record the tiling the cost model chose."""
    if not opts.json_log:
        return
    import json as _json

    tr, ng, rb, su, cb = tiling
    print(_json.dumps({
        "event": "plan", "input_shape": list(shape),
        "tile_rows": tr, "n_groups": ng, "rb": rb,
        "scan_unroll": su, "cb": cb,
    }))


def _kernel_supported(batch, opts: PipelineOptions) -> bool:
    """Static Pallas-kernel eligibility for one batch (remap_kernel.supported).

    Checked on the TPU dispatch path so unsupported inputs (e.g. >8-channel
    EXRs) fall back to the always-exact XLA pyramid, mirroring the
    reference's single dispatch pyramid (src/reproject.cpp:348-419).
    """
    from .ops.pallas import remap_kernel

    return remap_kernel.supported(
        batch[0], opts.input_lens, opts.output_lens, opts.interp, opts.n_samples
    )


def process_batch(
    images: Sequence[np.ndarray], opts: PipelineOptions
) -> List[np.ndarray]:
    """Remap + tonemap a uniform-shape batch on device; returns host arrays."""
    import jax
    import jax.numpy as jnp

    with trace_zone("device_dispatch"):
        batch = jnp.asarray(np.stack(images))
        if opts.device is not None:
            batch = jax.device_put(batch, opts.device)
        rot = None if opts.rotation is None else jnp.asarray(opts.rotation)
        if not opts.do_reproject and opts.scale == 1.0:
            out = batch  # --no-reproject fast path (src/main.cpp:592-596)
            if opts.exposure != 1.0 or opts.reinhard != 1.0:
                out = color.post_process_jit(
                    out, exposure=opts.exposure, reinhard=opts.reinhard
                )
        elif (mesh_shape := _resolve_mesh(opts)) is not None:
            # Multi-chip: shard the batch (and optionally output row bands)
            # over the device mesh; sharded_remap_step all-gathers source
            # bands over ICI and runs the banded kernel per device.
            from .ops.pallas import remap_kernel
            from .parallel import batch as pbatch
            from .parallel import mesh as pmesh

            b_ax, r_ax = mesh_shape
            dmesh = pmesh.make_mesh(
                devices=jax.devices()[: b_ax * r_ax], batch=b_ax, rows=r_ax
            )
            in_h = int(batch.shape[1])
            # Plan cache, mesh flavor: suggest_tiling plus the sharded
            # rescue cap (n_rows eager make_prepass device passes + a
            # blocking fetch) are config-only — a directory frame stream
            # must pay them once, not per batch (tunnel dispatch is ~ms
            # and D2H is slow; see CLAUDE.md hazards). The rescue gating
            # state is part of the key: evidence can appear mid-process
            # (verify_onchip writing the marker) and must not be frozen
            # by a stale plan.
            mesh_rescue = (
                jax.default_backend() == "tpu" and dispatch.rescue_enabled()
            )
            key = ("mesh", mesh_shape, batch.shape[1:], opts.input_lens,
                   opts.output_lens, opts.out_height, opts.out_width,
                   opts.interp, opts.n_samples,
                   None if opts.rotation is None else opts.rotation.tobytes(),
                   mesh_rescue)
            cached = _plan_cache_get(key)
            if cached is None:
                # The tiling pick must model only what the runtime will
                # actually do: no rescue pricing when rescue is off.
                tile_rows, n_groups, rb, scan_unroll, cb = remap_kernel.suggest_tiling(
                    opts.input_lens, opts.output_lens,
                    in_h, int(batch.shape[2]),
                    opts.out_height, opts.out_width,
                    opts.rotation, opts.interp,
                    channels=int(batch.shape[3]),
                    with_rescue=mesh_rescue,
                )
                # Pass-2 rescue inside each device's band: static cap =
                # the max rescuable count over all bands (config-only;
                # 0 on the virtual CPU mesh or clean configs). Gated on
                # on-chip verification evidence (dispatch.rescue_enabled).
                mesh_rescue_cap = 0
                mesh_budgets = None
                if mesh_rescue:
                    from .ops import remap_fused

                    mesh_budgets = remap_fused.choose_rescue_budgets(
                        rot, in_lens=opts.input_lens,
                        out_lens=opts.output_lens, in_h=in_h,
                        in_w=int(batch.shape[2]), out_h=opts.out_height,
                        out_w=opts.out_width, interp=opts.interp,
                        n_samples=opts.n_samples,
                        tile_rows=tile_rows, n_groups=n_groups, rb=rb,
                        scan_unroll=scan_unroll, cb=cb,
                        channels=int(batch.shape[3]),
                    )
                    if mesh_budgets is not None:
                        mesh_rescue_cap = pbatch.size_rescue_cap(
                            dmesh, in_lens=opts.input_lens,
                            out_lens=opts.output_lens, in_h=in_h,
                            in_w=int(batch.shape[2]), out_h=opts.out_height,
                            out_w=opts.out_width, interp=opts.interp,
                            rotation=rot, n_samples=opts.n_samples,
                            tile_rows=tile_rows, n_groups=n_groups, rb=rb,
                            scan_unroll=scan_unroll, cb=cb,
                            channels=int(batch.shape[3]),
                            rescue_budgets=mesh_budgets,
                        )
                cached = (tile_rows, n_groups, rb, scan_unroll, cb,
                          mesh_rescue_cap, mesh_budgets)
                _plan_cache_put(key, cached)
                _log_plan(opts, cached[:5], batch.shape[1:])
            (tile_rows, n_groups, rb, scan_unroll, cb,
             mesh_rescue_cap, mesh_budgets) = cached
            n_real = batch.shape[0]
            pad = (-n_real) % b_ax
            if pad:
                batch = jnp.concatenate(
                    [batch, jnp.repeat(batch[-1:], pad, axis=0)]
                )
            pad_h = (-in_h) % r_ax
            if pad_h:
                # Edge-replicated rows for even rows-axis sharding only;
                # sliced back off right after the device all_gather.
                batch = jnp.concatenate(
                    [batch, jnp.repeat(batch[:, -1:], pad_h, axis=1)], axis=1
                )
            sharded = pbatch.shard_batch(batch, dmesh)
            out = pbatch.sharded_remap_step(
                sharded,
                rot,
                mesh=dmesh,
                rescue_cap=mesh_rescue_cap,
                rescue_budgets=mesh_budgets,
                in_lens=opts.input_lens,
                out_lens=opts.output_lens,
                out_h=opts.out_height,
                out_w=opts.out_width,
                interp=opts.interp,
                n_samples=opts.n_samples,
                exposure=opts.exposure,
                reinhard=opts.reinhard,
                tile_rows=tile_rows,
                n_groups=n_groups,
                rb=rb,
                scan_unroll=scan_unroll,
                cb=cb,
                in_h=in_h,
            )[:n_real]
        elif (
            jax.default_backend() == "tpu"
            and not dispatch.pure_xla_forced()
            and _kernel_supported(batch, opts)
        ):
            # TPU: per-image fused remap+tonemap (Pallas kernel path with
            # XLA fallback); dispatches are async so the batch pipelines.
            # The prepass depends only on the config, so it is planned once
            # per (input shape, config) and reused across the frame stream.
            from .ops import remap_fused
            from .ops.pallas import remap_kernel

            # Pass-2 rescue only with on-chip verification evidence for
            # the current kernel sources (or an explicit override):
            # rescue-off is a perf fallback (bad sub-tiles take the XLA
            # patch), never a correctness change. The gating state is
            # part of the cache key — evidence can appear mid-process
            # (verify_onchip writing the marker).
            use_rescue = dispatch.rescue_enabled()
            use_pixel_patch = dispatch.pixel_patch_enabled()
            use_split = use_rescue and dispatch.split_enabled()
            key = (batch.shape[1:], opts.input_lens, opts.output_lens,
                   opts.out_height, opts.out_width, opts.interp,
                   opts.n_samples,
                   None if opts.rotation is None else opts.rotation.tobytes(),
                   use_rescue, use_pixel_patch, use_split)
            cached = _plan_cache_get(key)
            if cached is None:
                # The tiling pick models only what the runtime will do:
                # no rescue pricing when rescue is off.
                tile_rows, n_groups, rb, scan_unroll, cb = remap_kernel.suggest_tiling(
                    opts.input_lens, opts.output_lens,
                    int(batch.shape[1]), int(batch.shape[2]),
                    opts.out_height, opts.out_width,
                    opts.rotation, opts.interp,
                    channels=int(batch.shape[3]),
                    with_rescue=use_rescue,
                )
                # One shared construction path (plan + ladder-chosen
                # budgets + cap) with bench.py/baseline_configs.
                plan = remap_fused.plan_with_rescue(
                    rot, use_rescue=use_rescue,
                    pixel_patch=use_pixel_patch, split=use_split,
                    in_lens=opts.input_lens, out_lens=opts.output_lens,
                    in_h=int(batch.shape[1]), in_w=int(batch.shape[2]),
                    out_h=opts.out_height, out_w=opts.out_width,
                    interp=opts.interp, n_samples=opts.n_samples,
                    tile_rows=tile_rows, n_groups=n_groups, rb=rb,
                    scan_unroll=scan_unroll, cb=cb,
                    channels=int(batch.shape[3]),
                )
                scalars, bad, rescue, rescue_cap, budgets, valid_px = plan[:6]
                split_f, split_cap = (plan[6], plan[7]) if use_split \
                    else (None, 0)
                cached = (tile_rows, n_groups, rb, scan_unroll, cb,
                          scalars, bad, rescue, rescue_cap, budgets,
                          valid_px, split_f, split_cap)
                _plan_cache_put(key, cached)
                _log_plan(opts, cached[:5], batch.shape[1:])
            (tile_rows, n_groups, rb, scan_unroll, cb,
             scalars, bad, rescue, rescue_cap, budgets, valid_px,
             split_f, split_cap) = cached
            # One device dispatch for the whole batch (lax.scan over
            # frames inside one jit): at 1080p each dispatch carries ~ms
            # of tunnel/dispatch latency, so per-image launches taxed
            # small-frame batches (reference analog: per-image task
            # submission, src/main.cpp:536-657).
            out = remap_fused.remap_tonemap_planned_batch(
                batch,
                rot,
                scalars,
                bad,
                rescue,
                valid_px,
                split_f,
                rescue_cap=rescue_cap,
                rescue_budgets=budgets,
                split_cap=split_cap,
                in_lens=opts.input_lens,
                out_lens=opts.output_lens,
                out_h=opts.out_height,
                out_w=opts.out_width,
                interp=opts.interp,
                n_samples=opts.n_samples,
                exposure=opts.exposure,
                reinhard=opts.reinhard,
                tile_rows=tile_rows,
                n_groups=n_groups,
                rb=rb,
                scan_unroll=scan_unroll,
                cb=cb,
            )
        else:
            out = remap.remap_batch_jit(
                batch,
                rot,
                in_lens=opts.input_lens,
                out_lens=opts.output_lens,
                out_h=opts.out_height,
                out_w=opts.out_width,
                interp=opts.interp,
                n_samples=opts.n_samples,
            )
            if opts.exposure != 1.0 or opts.reinhard != 1.0:
                out = color.post_process_jit(
                    out, exposure=opts.exposure, reinhard=opts.reinhard
                )
        host = np.asarray(out)
    return [host[i] for i in range(host.shape[0])]


def write_outputs(img: np.ndarray, layout, opts: PipelineOptions, out_png: Path, out_exr: Path):
    with trace_zone("encode"):
        if opts.store_png:
            png_io.write_png(str(out_png), img)
        if opts.store_exr:
            exr_io.write_exr(str(out_exr), img)


def run_pipeline(
    paths: Sequence[Path],
    output_dir: str,
    opts: PipelineOptions,
) -> PipelineStats:
    """Process a list of input images end to end.

    Decode and encode run on ``opts.num_threads`` host threads; device
    dispatches are batched ``opts.batch_size`` at a time. Failures are
    isolated per image (src/main.cpp:617-619) and reported at the end.
    """
    output_dir_path = Path(output_dir)
    output_dir_path.mkdir(parents=True, exist_ok=True)

    stats = PipelineStats(json_log=opts.json_log)
    count = len(paths)
    t0 = time.perf_counter()

    # Stage 1: skip-check + decode (host threads).
    todo = []
    for p in paths:
        out_png, out_exr = _output_paths(output_dir_path, p)
        if opts.skip_if_exists and _outputs_exist(opts, out_png, out_exr):
            print(f"Skipping '{out_png}'. Already exists.")
            stats.done += 1
            continue
        todo.append((p, out_png, out_exr))

    if opts.ordering not in ("overlap", "serial"):
        raise ValueError(
            f"ordering must be 'overlap' or 'serial', got {opts.ordering!r}")
    serial = opts.ordering == "serial"
    stats.ordering = opts.ordering
    pool = ThreadPoolExecutor(
        max_workers=1 if serial else max(1, opts.num_threads))

    def decode_one(item):
        p, out_png, out_exr = item
        try:
            with trace_zone("decode"):
                buf = read_image(p)
            return (p, out_png, out_exr, buf, None)
        except Exception as e:  # per-image isolation
            return (p, out_png, out_exr, None, e)

    # "overlap": pool.map prefetches decodes across threads while the
    # device works and encodes are submitted asynchronously below.
    # "serial": decode lazily on the consumer thread, one frame fully
    # finishing (including its encode) before the next decode starts.
    decoded_iter = (
        map(decode_one, todo) if serial else pool.map(decode_one, todo))

    # Stage 2+3: batch device dispatch, then encode on host threads.
    pending_writes = []
    batch_items: List[tuple] = []

    def flush_batch():
        if not batch_items:
            return
        items = list(batch_items)
        batch_items.clear()
        try:
            results = process_batch([b.data for (_, _, _, b, _) in items], opts)
        except Exception as e:
            for (p, _, _, _, _) in items:
                stats.mark_failed(p.name, e)
            return
        for (p, out_png, out_exr, buf, _), img in zip(items, results):
            def write_and_count(img=img, buf=buf, p=p, out_png=out_png, out_exr=out_exr):
                try:
                    write_outputs(img, buf.layout, opts, out_png, out_exr)
                    stats.mark_done(count, p.stem, pixels=img.shape[0] * img.shape[1])
                except Exception as e:
                    stats.mark_failed(p.name, e)
            if serial:
                write_and_count()
            else:
                pending_writes.append(pool.submit(write_and_count))

    current_shape = None
    for p, out_png, out_exr, buf, err in decoded_iter:
        if err is not None:
            stats.mark_failed(p.name, err)
            continue
        # Keep batches shape-uniform; flush on shape change to avoid
        # recompiles interleaving (each unique shape jit-specializes once).
        if current_shape is not None and buf.data.shape != current_shape:
            flush_batch()
        current_shape = buf.data.shape
        batch_items.append((p, out_png, out_exr, buf, None))
        if len(batch_items) >= opts.batch_size:
            flush_batch()
    flush_batch()

    for fut in pending_writes:
        fut.result()
    pool.shutdown(wait=True)

    stats.wall_seconds = time.perf_counter() - t0
    if stats.failed:
        print(f"Failed {len(stats.failed)} file(s): {', '.join(stats.failed)}", file=sys.stderr)
    if stats.pixels and stats.wall_seconds > 0:
        mpixps = stats.pixels / stats.wall_seconds / 1e6
        print(f"Throughput: {mpixps:.1f} Mpix/s ({stats.done} images, {stats.wall_seconds:.2f}s)")
    return stats
