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
    args = ap.parse_args()

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

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="profile_step_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            state, metrics = step_fn(state, batch_data)
        jax.block_until_ready(state.params)

    events = collect_trace_events(trace_dir)
    agg = device_op_durations(events)
    rows = sorted(agg.items(), key=lambda kv: -kv[1]["total_us"])
    total_us = sum(v["total_us"] for _, v in rows)
    print(f"\n{len(events)} trace events, {len(rows)} XLA ops, "
          f"{total_us / 1e3:.1f} ms aggregated over {args.steps} steps "
          f"({total_us / 1e3 / max(args.steps, 1):.1f} ms/step attributed)")
    print(f"{'ms/step':>9}  {'%':>5}  {'n':>4}  op  [source]")
    for name, v in rows[: args.top]:
        ms = v["total_us"] / 1e3 / max(args.steps, 1)
        pct = 100.0 * v["total_us"] / total_us if total_us else 0.0
        src = f"  [{v['source']}]" if v["source"] else ""
        print(f"{ms:9.3f}  {pct:5.1f}  {v['count']:4d}  {name[:80]}{src}")
    if args.trace_dir is None:
        print(f"\n(raw trace kept at {trace_dir})")


if __name__ == "__main__":
    main()
