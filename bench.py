#!/usr/bin/env python
"""Benchmark: HRNet-W48+contrast(+memory) train-step throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no images/sec (BASELINE.md) — vs_baseline reports
against the first recorded run of this bench (bench_baseline.json),
so the driver can track relative progress across rounds.

Usage: python bench.py [--dry] [--batch N] [--steps N] [--image-size HxW]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")


# BENCHABLE presets (BASELINE.json configs 2/3/4): --preset picks the
# model family; default stays the flagship HRNet+mem config.
PRESET_ALIASES = {
    "mem": "cityscapes_hrnet_w48_mem",
    "contrast": "cityscapes_hrnet_w48_contrast",
    "deeplab": "cityscapes_deeplab_v3",
    "deeplab_contrast": "cityscapes_deeplab_v3_contrast",
    "hrnet": "cityscapes_hrnet_w48",
}


def build_bench(batch: int, hw: tuple[int, int], bf16: bool, memory: bool,
                remat: bool = False, remat_stem: bool = False,
                donate: bool = False, pallas_conv: bool = False,
                lane_pad: bool = False, preset: str | None = None,
                exact_sampling: bool = False, remat_concat: bool = False,
                grad_accum: int = 1):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from contrastiveseg_tpu.engine.optim import build_optimizer
    from contrastiveseg_tpu.engine.state import TrainState
    from contrastiveseg_tpu.engine.train_step import make_train_step
    from contrastiveseg_tpu.losses.manager import build_loss
    from contrastiveseg_tpu.models.nets import build_model
    from contrastiveseg_tpu.ops.queue import init_memory_bank
    from contrastiveseg_tpu.presets import get_preset

    if preset is None:
        preset = "mem" if memory else "contrast"
    preset = PRESET_ALIASES.get(preset, preset)
    cfg = get_preset(preset)
    memory = memory and cfg.get("contrast.with_memory", default=False)
    cfg = cfg.updated("network.bf16", bf16)
    cfg = cfg.updated("network.remat", remat)
    cfg = cfg.updated("network.remat_stem", remat_stem)
    cfg = cfg.updated("network.pallas_conv", pallas_conv)
    cfg = cfg.updated("network.lane_pad", lane_pad)
    cfg = cfg.updated("contrast.exact_sampling", exact_sampling)
    cfg = cfg.updated("network.remat_concat", remat_concat)
    cfg = cfg.updated("network.remat_scope",
                      os.environ.get("BENCH_REMAT_SCOPE", "stem_layer1"))
    # (BENCH_REMAT_SCOPE=layer1 measured 26.7 img/s vs 28.1 for the
    # default stem_layer1 — keeping the 268MB stem activations saved
    # re-triggers XLA's HLO remat elsewhere: +2.7 TF/step of replay.)
    cfg = cfg.updated("contrast.warmup_iters", 0)  # bench the full loss

    model = build_model(cfg)
    h, w = hw
    rng = jax.random.key(0)
    k_params, k_drop, k_bank, k_state = jax.random.split(rng, 4)
    variables = model.init(
        {"params": k_params, "dropout": k_drop},
        jnp.zeros((1, h, w, 3), jnp.float32),
        train=True,
    )
    tx = build_optimizer(cfg, variables["params"])
    bank = None
    if memory:
        bank = init_memory_bank(
            k_bank, cfg.get("data.num_classes"),
            cfg.get("contrast.memory_size"), cfg.get("contrast.proj_dim"),
        )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        bank=bank,
        rng=k_state,
        tx=tx,
    )
    # donate=False: buffer donation reliably faults the axon remote-TPU
    # worker with this program (INTERNAL kernel fault at first execute);
    # without it the step fits and runs ~25 img/s.  Real multi-chip
    # deployments keep donation on via the Trainer (network.donate).
    step_fn = make_train_step(
        model,
        build_loss(cfg),
        warmup_iters=0,
        network_stride=cfg.get("network.stride"),
        pixel_update_freq=cfg.get("contrast.pixel_update_freq", default=10),
        donate=donate,
        exact_sampling=exact_sampling,
        grad_accum_steps=grad_accum,
    )

    rng_np = np.random.default_rng(0)
    batch_data = {
        "image": jnp.asarray(
            rng_np.standard_normal((batch, h, w, 3)).astype(np.float32)
        ),
        "label": jnp.asarray(
            rng_np.integers(0, 19, size=(batch, h, w)).astype(np.int32)
        ),
    }
    return state, step_fn, batch_data


# Peak dense TFLOP/s per chip (bf16 / fp32) by device kind, for MFU.
# Sources: public TPU spec sheets; CPU has no meaningful peak here.
_PEAK_TFLOPS = {
    "TPU v4": (275.0, 137.5),
    "TPU v5 lite": (197.0, 98.5),
    "TPU v5e": (197.0, 98.5),
    "TPU v5p": (459.0, 229.5),
    "TPU v6e": (918.0, 459.0),
    "TPU v6 lite": (918.0, 459.0),
}


def _peak_tflops(bf16: bool):
    import jax

    kind = jax.devices()[0].device_kind
    for k, (p_bf16, p_fp32) in _PEAK_TFLOPS.items():
        if kind.lower().startswith(k.lower()):
            return (p_bf16 if bf16 else p_fp32), kind
    if "tpu" in kind.lower() or "axon" in kind.lower():
        # Unknown TPU kind: assume v5e-class (conservative for newer chips).
        return (197.0 if bf16 else 98.5), kind
    return None, kind


def run(batch: int, hw: tuple[int, int], steps: int, bf16: bool,
        memory: bool, remat: bool = False, remat_stem: bool = False,
        donate: bool = False, pallas_conv: bool = False,
        lane_pad: bool = False, preset: str | None = None,
        exact_sampling: bool = False, eval_mode: bool = False,
        remat_concat: bool = False, grad_accum: int = 1):
    import jax
    import jax.numpy as jnp

    state, step_fn, batch_data = build_bench(batch, hw, bf16, memory, remat,
                                             remat_stem, donate, pallas_conv,
                                             lane_pad, preset, exact_sampling,
                                             remat_concat, grad_accum)
    if eval_mode:
        # Inference forward (engine/tester.py ss_test inner step), or the
        # full multi-scale + flip test (ms_test, BASELINE config 5) when
        # eval_mode == "ms": the reference's published scale set
        # (H_48_D_4_TEST.json scale_search) fused into ONE jit so the
        # axon relay sees a single dispatch per step.
        params, batch_stats = state.params, state.batch_stats
        from contrastiveseg_tpu.models.nets import build_model
        from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners
        from contrastiveseg_tpu.presets import get_preset

        cfg = get_preset(PRESET_ALIASES.get(
            preset or ("mem" if memory else "contrast"), preset or ""))
        cfg = cfg.updated("network.bf16", bf16)
        model = build_model(cfg)
        ms_scales = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0)

        def _seg(params, batch_stats, images):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out = model.apply(variables, images, train=False)
            return out["seg"]

        if eval_mode == "ms":
            h, w = hw

            def fwd(params, batch_stats, images):
                total = jnp.zeros((images.shape[0], h, w,
                                   cfg.get("data.num_classes")), jnp.float32)
                flipped = images[:, :, ::-1, :]
                for s in ms_scales:
                    sh, sw = int(h * s), int(w * s)
                    for img, unflip in ((images, False), (flipped, True)):
                        x = resize_bilinear_align_corners(img, (sh, sw))
                        logits = _seg(params, batch_stats, x)
                        probs = jax.nn.softmax(
                            resize_bilinear_align_corners(
                                logits.astype(jnp.float32), (h, w)), -1)
                        total = total + (
                            probs[:, :, ::-1, :] if unflip else probs)
                return total
        else:
            fwd = _seg

        step_fn = jax.jit(fwd)
        images = batch_data["image"]
        y = step_fn(params, batch_stats, images)
        float(jax.device_get(y.reshape(-1)[0]))
        t0 = time.time()
        for _ in range(steps):
            y = step_fn(params, batch_stats, images)
        float(jax.device_get(y.reshape(-1)[0]))
        dt = time.time() - t0
        n_chips = jax.device_count()
        peak, kind = _peak_tflops(bf16)
        return {
            "images_per_sec_per_chip": batch * steps / dt / n_chips,
            "loss": 0.0, "step_tflops": None,
            "tflops_per_sec_per_chip": None, "device_kind": kind,
            "mfu": None, "peak_tflops": peak,
        }
    # AOT-compile exactly once, so the executable also hands us its cost
    # analysis (utils/flops.xla_flops idea; VERDICT.md weak-1: anchor the
    # bench in MFU, not vs-self).
    step_flops = None
    # BENCH_XLA_OPTS="k=v,k2=v2": server-side compiler options (the axon
    # relay rejects TPU flags in client XLA_FLAGS; PJRT compiler_options
    # reach the real compiler).
    copts = None
    if os.environ.get("BENCH_XLA_OPTS"):
        copts = dict(kv.split("=", 1)
                     for kv in os.environ["BENCH_XLA_OPTS"].split(","))
    try:
        lowered = step_fn.lower(state, batch_data)
        try:
            compiled = (lowered.compile(compiler_options=copts)
                        if copts else lowered.compile())
        except Exception as e:  # noqa: BLE001 — unknown option etc.
            if copts:
                print(f"# compiler_options rejected ({e}); compiling plain",
                      file=sys.stderr)
            compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        step_flops = float(cost.get("flops", 0.0)) or None
        step_fn = compiled
    except Exception:  # noqa: BLE001 — fall back to plain jit dispatch
        pass

    # Warmup.  NOTE: device_get (value fetch), not block_until_ready — the
    # axon remote-TPU relay acks readiness before execution completes,
    # which once inflated this bench 30x.
    state, metrics = step_fn(state, batch_data)
    float(jax.device_get(metrics["loss"]))

    t0 = time.time()
    for _ in range(steps):
        state, metrics = step_fn(state, batch_data)
    float(jax.device_get(metrics["loss"]))
    dt = time.time() - t0
    n_chips = jax.device_count()
    perf = {
        "images_per_sec_per_chip": batch * steps / dt / n_chips,
        "loss": float(metrics["loss"]),
        "step_tflops": round(step_flops / 1e12, 3) if step_flops else None,
        "tflops_per_sec_per_chip": (
            round(step_flops * steps / dt / n_chips / 1e12, 2)
            if step_flops else None
        ),
    }
    peak, kind = _peak_tflops(bf16)
    perf["device_kind"] = kind
    if step_flops and peak:
        perf["mfu"] = round(step_flops * steps / dt / n_chips / 1e12 / peak, 4)
        perf["peak_tflops"] = peak
    else:
        perf["mfu"] = None
    return perf


def run_input_bench(num_workers: int, batches: int = 20) -> None:
    """Host-side input pipeline throughput: Cityscapes-shaped frames
    (1024x2048) through the flagship train aug (fused resize+crop, hflip,
    brightness) + fused normalize/pad/stack collate.  Decode excluded
    (4 cached frames) — this measures the pipeline, which must outrun the
    TPU step (28+ img/s/chip) to keep training compute-bound."""
    import time

    import numpy as np

    from contrastiveseg_tpu.data.pipeline import DataPipeline
    from contrastiveseg_tpu.data.transforms import (
        Normalizer, build_train_transforms)
    from contrastiveseg_tpu.presets import get_preset

    rng = np.random.default_rng(0)
    cache = [
        {"image": rng.integers(0, 255, (1024, 2048, 3), dtype=np.uint8),
         "label": rng.integers(0, 19, (1024, 2048)).astype(np.int32)}
        for _ in range(4)
    ]

    class _DS:
        def __len__(self):
            return 10_000

        def __getitem__(self, i):
            return dict(cache[i % 4])

    cfg = get_preset("cityscapes_hrnet_w48_mem")
    pipe = DataPipeline(
        _DS(), batch_size=8,
        transforms=build_train_transforms(cfg),
        normalizer=Normalizer(),
        collate_kwargs={"size_mode": "fix_size", "input_size": (1024, 512),
                        "align_method": "only_pad", "pad_mode": "random"},
        num_workers=num_workers,
    )
    it = pipe.epoch_iter(0)
    next(it)  # warm (thread pool + native lib load)
    t0 = time.perf_counter()
    for _ in range(batches):
        next(it)
    dt = time.perf_counter() - t0
    imgs = batches * 8 / dt
    print(json.dumps({
        "metric": "host_input_pipeline_imgs_per_sec",
        "value": round(imgs, 2),
        "unit": "img/s",
        "vs_baseline": round(imgs / 2.0, 2),  # round-2 pipeline: ~2 img/s
        "workers": num_workers,
    }))


def run_serve_bench(args) -> None:
    """Inference throughput through the serving artifact (jax.export
    serialize -> deserialize -> call) vs the live jitted forward, same
    backend, same shapes — the numbers should match to noise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from contrastiveseg_tpu.engine.state import restore_eval_state
    from contrastiveseg_tpu.models.nets import build_model
    from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners
    from contrastiveseg_tpu.presets import get_preset

    if args.dry:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        hw, batch, steps = (64, 128), args.batch or 1, min(args.steps, 3)
        backbone = "hrnet18"
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
        hw, batch, steps = (512, 1024), args.batch or 8, args.steps
        backbone = None

    cfg = get_preset("cityscapes_hrnet_w48_contrast")
    cfg = cfg.updated("network.bf16", not args.fp32)
    if backbone:
        cfg = cfg.updated("network.backbone", backbone)
    model = build_model(cfg)
    state = restore_eval_state(cfg, model, hw, batch=batch)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    # Weights ride as ARGUMENTS, not baked HLO constants — the
    # export_model.py --weights sidecar calling convention (weights.npz
    # device_put once at server start, tools/serve.py).  The compile
    # payload stays small: a constants-embedded W48 HLO is ~130-260 MB,
    # which the axon relay's remote_compile rejects with HTTP 413.
    def fwd(variables, images):
        out = model.apply(variables, images, train=False)
        seg = out["seg"] if isinstance(out, dict) else out
        return resize_bilinear_align_corners(seg, hw)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, *hw, 3)).astype(np.float32))
    variables = jax.device_put(variables)

    live = jax.jit(fwd)
    vspec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
    spec = jax.ShapeDtypeStruct((batch, *hw, 3), np.float32)
    served = jax.export.deserialize(
        jax.export.export(jax.jit(fwd))(vspec, spec).serialize())

    def measure(fn):
        jax.device_get(fn(variables, x))  # warm/compile
        t0 = time.perf_counter()
        for _ in range(steps):
            y = fn(variables, x)
        jax.device_get(y)
        return batch * steps / (time.perf_counter() - t0)

    r_live = measure(live)
    r_served = measure(served.call)
    print(json.dumps({
        "metric": "serving_artifact_inference_imgs_per_sec",
        "value": round(r_served, 2),
        "unit": "img/s",
        "vs_baseline": round(r_served / max(r_live, 1e-9), 3),
        "live_imgs_per_sec": round(r_live, 2),
        "batch": batch,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry", action="store_true", help="tiny CPU shapes")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--image-size", default=None, help="HxW, e.g. 512x1024")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--no-memory", action="store_true")
    ap.add_argument("--record-baseline", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize HRNet modules (bigger batches)")
    ap.add_argument("--remat-stem", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="checkpoint only stem+layer1 (frees ~1.9GB; stops "
                         "XLA from replaying the 2.4TF cls_head conv: "
                         "25.5 -> 28.1 img/s measured)")
    ap.add_argument("--pallas-conv", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="route small-channel 3x3 convs through the "
                         "Pallas kernel (ops/conv_pallas.py)")
    ap.add_argument("--lane-pad", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="pad sub-64 HRNet branch widths to 64 "
                         "(models/hrnet.py lane_pad_spec) — TPU layout "
                         "experiment, VERDICT r2 item 3")
    ap.add_argument("--remat-concat", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="checkpoint the 720-ch branch concat (recompute "
                         "cheap fuse resizes in the backward; frees ~380MB)")
    ap.add_argument("--ms-eval", action="store_true",
                    help="benchmark the full multi-scale+flip inference "
                         "(Tester ms_test semantics, reference "
                         "H_48_D_4_TEST.json scale_search 0.5..2.0 — "
                         "BASELINE config 5) fused into one jit")
    ap.add_argument("--eval", action="store_true",
                    help="benchmark the inference forward (Tester ss_test "
                         "path: eval-mode model at the given size) instead "
                         "of the train step")
    ap.add_argument("--exact-sampling", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="exact top_k in sampler+enqueue instead of "
                         "approx_max_k (layout-deterministic; measure the "
                         "TPU cost — VERDICT r2 item 2)")
    ap.add_argument("--preset", default=None,
                    help="model family to bench: one of "
                         f"{sorted(PRESET_ALIASES)} or a full preset name "
                         "(VERDICT r2 weak-4: bench all flagship configs)")
    ap.add_argument("--donate", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="donate state buffers (default: auto — first "
                         "attempt donates, retries fall back; donation "
                         "faulted the axon worker in round 1 but measured "
                         "+0.5%% in round 2)")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="grad_accum_steps: microbatch the step (effective "
                         "batch = --batch, activation memory = batch/N) — "
                         "the OOM-avoiding lever for effective batch 16 "
                         "on one v5e")
    ap.add_argument("--worker", action="store_true",
                    help="(internal) run the measurement in-process")
    ap.add_argument("--input", action="store_true",
                    help="benchmark the HOST input pipeline (aug + "
                         "normalize + collate on cached full-res frames; "
                         "no TPU) in img/s per core")
    ap.add_argument("--input-workers", type=int, default=0,
                    help="data.workers thread-pool size for --input")
    ap.add_argument("--serve", action="store_true",
                    help="benchmark inference THROUGH a jax.export "
                         "serialize->deserialize roundtrip (the serving "
                         "artifact path) vs the live jitted eval forward "
                         "— proves the exported graph costs nothing")
    args = ap.parse_args()

    if args.input:
        run_input_bench(args.input_workers, args.steps)
        return
    if args.serve:
        run_serve_bench(args)
        return

    if not args.worker and not args.dry:
        # The remote-TPU worker occasionally crashes mid-session
        # (UNAVAILABLE after an earlier process's big allocations); a fresh
        # client process reliably reconnects.  Run the measurement in a
        # child and retry, so the driver always gets a JSON line.
        import subprocess

        # The relay itself can be down for a while (observed: backend init
        # hangs or raises UNAVAILABLE for tens of minutes).  Probe with a
        # trivial op and wait before burning ladder attempts on a dead
        # backend.  BENCH_WAIT_TPU_S=0 disables.
        wait_budget = int(os.environ.get("BENCH_WAIT_TPU_S", "1800"))
        probe = ("import jax, jax.numpy as jnp; "
                 "print(jax.device_get(jnp.ones((2,2)) @ jnp.ones((2,2)))"
                 ".sum())")
        waited = 0.0
        while wait_budget > 0:
            try:
                r = subprocess.run([sys.executable, "-c", probe],
                                   capture_output=True, timeout=600)
                if r.returncode == 0:
                    break
            except subprocess.TimeoutExpired:
                pass
            if waited >= wait_budget:
                print("# TPU backend unavailable after "
                      f"{waited:.0f}s of probing", file=sys.stderr)
                break
            print("# TPU backend not answering; retrying in 120s",
                  file=sys.stderr)
            time.sleep(120)
            waited += 720  # probe timeout + sleep

        base_args = []
        skip = False
        for a in sys.argv[1:]:
            if skip:
                skip = False
                continue
            if a == "--batch":
                skip = True
                continue
            if a.startswith("--batch") or a in ("--donate", "--no-donate"):
                continue
            base_args.append(a)
        start_batch = args.batch or 8
        last = ""
        # (batch, donate) ladder: donation measured +0.5% but faulted the
        # axon worker once in round 1, so only the first attempt donates
        # unless the user forced it with --[no-]donate.
        ladder = [(start_batch, True), (start_batch, False),
                  (start_batch, False), (max(start_batch // 2, 1), False),
                  (max(start_batch // 4, 1), False)]
        if args.donate is not None:
            ladder = [(b, args.donate) for b, _ in ladder]
        for attempt, (b, donate) in enumerate(ladder):
            cmd = [sys.executable, os.path.abspath(__file__), "--worker",
                   f"--batch={b}",
                   "--donate" if donate else "--no-donate"] + base_args
            try:
                proc = subprocess.run(cmd, capture_output=True, text=True,
                                      timeout=3600)
            except subprocess.TimeoutExpired:
                last = "timeout"
                continue
            for line in reversed(proc.stdout.strip().splitlines()):
                if line.startswith("{"):
                    print(line)
                    return
            last = (proc.stderr or "")[-2000:]
            print(f"# bench attempt {attempt + 1} (batch {b}) failed, "
                  "retrying", file=sys.stderr)
        print(f"# bench failed after retries: {last}", file=sys.stderr)
        sys.exit(1)

    if args.dry:
        # Host sitecustomize pins jax_platforms; env vars are too late.
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        # Reuse the test suite's persistent compile cache: the W48 step
        # takes 10+ min to compile cold on this host's single core.
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_TEST_CACHE_DIR",
                               os.path.expanduser(
                                   "~/.cache/jax_test_compcache")))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception:
            pass
        hw = (64, 128)
        batch = args.batch or 1
        steps = min(args.steps, 3)
    else:
        # Persistent compile cache for TPU workers too: repeat benches of
        # the same (config, XLA_FLAGS) skip the 8-25 min remote compile.
        import jax

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
        hw = (512, 1024)
        batch = args.batch or 8
        steps = args.steps
    if args.image_size:
        h, w = args.image_size.split("x")
        hw = (int(h), int(w))

    memory = not args.no_memory
    bf16 = not args.fp32

    # Back off on OOM so the bench always reports something.
    last_err = None
    for b in [batch, max(batch // 2, 1), max(batch // 4, 1), 1]:
        try:
            perf = run(b, hw, steps, bf16, memory, args.remat,
                       args.remat_stem, bool(args.donate),
                       args.pallas_conv, args.lane_pad, args.preset,
                       args.exact_sampling,
                       ("ms" if args.ms_eval else args.eval),
                       args.remat_concat, args.grad_accum)
            batch = b
            break
        except Exception as e:  # noqa: BLE001
            last_err = e
            if "RESOURCE_EXHAUSTED" not in str(e) and "Out of memory" not in str(e):
                raise
    else:
        raise last_err

    ips = perf["images_per_sec_per_chip"]
    vs_baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f).get("images_per_sec_per_chip")
        if base:
            vs_baseline = ips / base
    if args.record_baseline:
        with open(BASELINE_FILE, "w") as f:
            json.dump({"images_per_sec_per_chip": ips,
                       "batch": batch, "hw": list(hw)}, f)

    if args.preset is None:
        # Keep the historical metric name for driver-side continuity.
        tag = "hrnet_w48_contrast_mem" if memory else "hrnet_w48_contrast"
    else:
        tag = PRESET_ALIASES.get(args.preset, args.preset).replace(
            "cityscapes_", "")
    if args.ms_eval:
        tag += "_ms_eval"
    elif args.eval:
        tag += "_eval"
    print(json.dumps({
        "metric": (
            f"cityscapes_512x1024_train_images_per_sec_per_chip_{tag}"
        ),
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": vs_baseline,
        "mfu": perf["mfu"],
        "step_tflops": perf["step_tflops"],
        "tflops_per_sec_per_chip": perf["tflops_per_sec_per_chip"],
        "device_kind": perf["device_kind"],
        "peak_tflops": perf.get("peak_tflops"),
        "batch": batch,
    }))


if __name__ == "__main__":
    main()
