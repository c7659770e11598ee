#!/usr/bin/env python
"""Profile the jitted train step and print a per-fusion time breakdown.

Reproducible version of the ad-hoc profiling that found the round-2 wins
(the 65 ms CE gather, the cls_head replay): runs N steps under
``jax.profiler.trace`` and aggregates the device-side events from the
emitted ``*.trace.json.gz`` — top fusions by self time, with their HLO op
names and (when XLA recorded them) the Python source lines they came
from.  The reference's analogue is wall-clock AverageMeters per phase
(trainer_contrastive.py:28-32,205-266); this attributes time to actual
compiled kernels instead.

    python tools/profile_step.py --preset mem --steps 3 --top 25
    python tools/profile_step.py --dry            # CPU, tiny shapes
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect_trace_events(trace_dir: str) -> list[dict]:
    events = []
    for path in glob.glob(
            os.path.join(trace_dir, "**", "*.trace.json.gz"),
            recursive=True):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        events.extend(data.get("traceEvents", []))
    return events


def device_op_durations(events: list[dict]) -> dict[str, dict]:
    """Aggregate complete events ('ph' == 'X') on device tracks by name."""
    # Device tracks are the process names containing TPU/device; on CPU
    # backends XLA uses '/device:' or TensorFlow-style names.  Fall back
    # to 'every X event with args.long_name or args.source' which only
    # XLA ops carry.
    agg: dict[str, dict] = collections.defaultdict(
        lambda: {"total_us": 0.0, "count": 0, "source": ""})
    for ev in events:
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        name = ev.get("name", "")
        if not name or name.startswith("$"):
            continue
        # Keep XLA-ish events only: fusions, convolutions, copies, etc.
        if not (args.get("long_name") or args.get("source")
                or "fusion" in name or "convolution" in name
                or "copy" in name or "dot" in name or "custom-call" in name
                or "reduce" in name or "scatter" in name):
            continue
        a = agg[name]
        a["total_us"] += float(ev.get("dur", 0.0))
        a["count"] += 1
        src = args.get("source") or args.get("from")
        if src and not a["source"]:
            a["source"] = str(src)
    return dict(agg)


def bucketize(agg: dict[str, dict]) -> dict[str, dict]:
    """Roofline buckets: classify each XLA op by SOURCE first (on TPU the
    conv work appears as fusions whose source is flax linen/linear.py —
    the conv_general_dilated call — not as ops named 'convolution'), then
    by op name for source-less ops (copies, reduces).

    The table this prints (with achieved TF/s for the conv bucket and the
    host gap vs wall time) is the per-bucket decomposition VERDICT r3
    item 5 asks for; BENCH_NOTES_r04.md carries the measured copy."""
    out: dict[str, dict] = collections.defaultdict(
        lambda: {"total_us": 0.0, "count": 0})

    src_rules = [
        ("conv/matmul (flax Conv fusions)", ["linen/linear.py",
                                             "linen/attention.py"]),
        ("contrast loss", ["ops/contrast", "losses/contrast"]),
        ("bank enqueue", ["ops/queue"]),
        ("resize/interp", ["ops/resize"]),
        ("ce loss", ["losses/ce", "losses/manager", "losses/rmi",
                     "losses/lovasz"]),
        ("optimizer", ["optax", "engine/optim", "engine/state"]),
        ("train-step glue", ["engine/train_step"]),
        ("hrnet fuse/BN/act", ["models/hrnet.py", "linen/normalization"]),
        ("heads/necks", ["models/nets.py", "models/heads.py",
                         "models/layers.py", "models/resnet.py"]),
    ]
    name_rules = [
        ("layout (copy/transpose)", ["copy", "transpose", "bitcast"]),
        ("collective", ["all-reduce", "all-gather", "reduce-scatter"]),
        ("conv/matmul (flax Conv fusions)", ["convolution", "dot."]),
        ("reduce (no source)", ["reduce"]),
        ("gather/scatter/slice", ["gather", "scatter", "dynamic-slice",
                                  "dynamic-update"]),
        ("while/control", ["while", "conditional"]),
    ]

    def classify(name: str, source: str) -> str:
        for bucket, keys in src_rules:
            if any(k in source for k in keys):
                return bucket
        for bucket, keys in name_rules:
            if any(k in name for k in keys):
                return bucket
        return "other fusion" if "fusion" in name else "other"

    for name, v in agg.items():
        b = classify(name, v.get("source", ""))
        out[b]["total_us"] += v["total_us"]
        out[b]["count"] += v["count"]
    return dict(out)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="mem")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--image-size", default=None, help="HxW")
    ap.add_argument("--dry", action="store_true", help="CPU, tiny shapes")
    ap.add_argument("--trace-dir", default=None,
                    help="keep the raw trace here (default: tempdir)")
    ap.add_argument("--from-trace", action="store_true",
                    help="re-analyze an existing --trace-dir without "
                         "touching any device (offline re-bucketing)")
    ap.add_argument("--wall-ms", type=float, default=None,
                    help="known wall ms/step (for --from-trace %% columns)")
    args = ap.parse_args()

    if args.from_trace:
        assert args.trace_dir, "--from-trace needs --trace-dir"
        events = collect_trace_events(args.trace_dir)
        agg = device_op_durations(events)
        total_us = sum(v["total_us"] for v in agg.values())
        steps = max(args.steps, 1)
        wall = args.wall_ms or total_us / 1e3 / steps
        _print_report(agg, total_us, steps, wall, args.top, None, None)
        return

    import jax

    if args.dry:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_TEST_CACHE_DIR",
                               os.path.expanduser(
                                   "~/.cache/jax_test_compcache")))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception:
            pass
        hw, batch = (64, 128), args.batch or 1
    else:
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_TPU_CACHE_DIR",
                               os.path.expanduser(
                                   "~/.cache/jax_tpu_compcache")))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 10.0)
        except Exception:
            pass
        hw, batch = (512, 1024), args.batch or 8
    if args.image_size:
        h, w = (int(x) for x in args.image_size.split("x"))
        hw = (h, w)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    state, step_fn, batch_data = bench.build_bench(
        batch, hw, bf16=not args.dry, memory=True, remat_stem=True,
        preset=args.preset)

    # Warm up (compile outside the trace).
    state, _ = step_fn(state, batch_data)
    jax.block_until_ready(state.params)

    import time

    # True warmup sync: device_get a VALUE (the axon relay acks
    # block_until_ready before execution finishes).
    state, warm_metrics = step_fn(state, batch_data)
    jax.device_get(warm_metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_fn(state, batch_data)
    jax.device_get(metrics["loss"])
    wall_ms_per_step = (time.perf_counter() - t0) * 1e3 / max(args.steps, 1)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="profile_step_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            state, metrics = step_fn(state, batch_data)
        jax.device_get(metrics["loss"])

    flops = None
    try:
        cost = step_fn.lower(state, batch_data).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:  # noqa: BLE001
        pass

    events = collect_trace_events(trace_dir)
    agg = device_op_durations(events)
    total_us = sum(v["total_us"] for v in agg.values())
    steps = max(args.steps, 1)
    print(f"\n{len(events)} trace events, {len(agg)} XLA ops, "
          f"{total_us / 1e3:.1f} ms aggregated over {steps} steps "
          f"({total_us / 1e3 / steps:.1f} ms/step attributed)")
    _print_report(agg, total_us, steps, wall_ms_per_step, args.top, flops,
                  None)
    if args.trace_dir is None:
        print(f"\n(raw trace kept at {trace_dir})")


def _print_report(agg: dict, total_us: float, steps: int, wall_ms: float,
                  top: int, flops, _unused) -> None:
    rows = sorted(agg.items(), key=lambda kv: -kv[1]["total_us"])
    print(f"{'ms/step':>9}  {'%':>5}  {'n':>4}  op  [source]")
    for name, v in rows[:top]:
        ms = v["total_us"] / 1e3 / steps
        pct = 100.0 * v["total_us"] / total_us if total_us else 0.0
        src = f"  [{v['source']}]" if v["source"] else ""
        print(f"{ms:9.3f}  {pct:5.1f}  {v['count']:4d}  {name[:80]}{src}")

    # --- roofline bucket table (VERDICT r3 item 5).
    buckets = bucketize(agg)
    brows = sorted(buckets.items(), key=lambda kv: -kv[1]["total_us"])
    print(f"\nBUCKETS (wall {wall_ms:.1f} ms/step, attributed "
          f"{total_us / 1e3 / steps:.1f} ms/step, host/dispatch gap "
          f"{wall_ms - total_us / 1e3 / steps:.1f} ms)")
    print(f"{'ms/step':>9}  {'%wall':>6}  {'n':>6}  bucket")
    for name, v in brows:
        ms = v["total_us"] / 1e3 / steps
        pct = 100.0 * ms / wall_ms if wall_ms else 0.0
        print(f"{ms:9.3f}  {pct:6.1f}  {v['count']:6d}  {name}")
    # Conv-bucket achieved TF/s: program FLOPs are ~all conv/matmul, so
    # total_flops / conv_time bounds the achieved MXU rate from above.
    conv_ms = buckets.get("conv/matmul (flax Conv fusions)", {}).get(
        "total_us", 0.0) / 1e3 / steps
    if flops and conv_ms:
        print(f"\nconv bucket: {flops / 1e12:.2f} TF/step over "
              f"{conv_ms:.1f} ms -> {flops / 1e12 / (conv_ms / 1e3):.1f} "
              "TF/s achieved (peak bf16 v5e: 197)")


if __name__ == "__main__":
    main()
