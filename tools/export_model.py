#!/usr/bin/env python
"""Export a trained model as a serialized StableHLO inference artifact.

Production-serving path with no reference counterpart (the reference
serves by loading torch checkpoints into the full python stack,
tester.py:52-91): `jax.export` AOT-lowers the eval forward — model apply
in eval mode (BN running stats folded) + align-corners upsample to input
resolution, i.e. the Tester ss_test inner step — into a versioned,
self-contained StableHLO blob that any PJRT runtime (python-less C++
serving, or a later jax version) can load and run.

    # export (random init, or --checkpoint <orbax dir>)
    python tools/export_model.py --preset cityscapes_hrnet_w48_contrast \
        --checkpoint ckpts/run1 --input-size 512x1024 --batch 1 \
        --out model_artifacts/w48

    # smoke-load + run the artifact in a fresh process
    python tools/export_model.py --load model_artifacts/w48 --cpu

Artifacts: `<out>.stablehlo` (serialized jax.export blob) and
`<out>.json` (input spec + normalize constants + class count, everything
a server needs to preprocess correctly).  With `--weights sidecar` the
blob is weight-free and `<out>.weights.npz` carries the variables,
passed as arguments at call time (see utils/tree_io.py for why).

`--scope ms` exports the full multi-scale+flip fusion (test.scale_search
unrolled into the graph) instead of the single-scale forward.
`--dynamic-batch` exports with a symbolic batch dimension so one
artifact serves any batch size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_forward(cfg, model, state, scope: str,
                   weights_as_args: bool = False):
    """Returns the eval forward.

    ``weights_as_args=False`` (baked): ``fwd(images)`` closing over the
    variables — a self-contained artifact carrying the weights as HLO
    constants.  ``weights_as_args=True`` (sidecar): ``fwd(variables,
    images)`` — the artifact is weight-free and a few MB; the variables
    ship separately (utils/tree_io npz) and are passed at call time.
    """
    import jax.numpy as jnp

    from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    def apply_ss(vars_, images):
        out = model.apply(vars_, images, train=False)
        seg = out["seg"] if isinstance(out, dict) else out
        return resize_bilinear_align_corners(
            seg, (images.shape[1], images.shape[2]))

    scales = cfg.get("test.scale_search", default=[0.75, 1.0, 1.25])

    def apply_ms(vars_, images):
        h, w = images.shape[1], images.shape[2]
        total = jnp.zeros((*images.shape[:3],
                           cfg.get("data.num_classes")), jnp.float32)
        flipped = images[:, :, ::-1, :]
        for s in scales:
            for src, flip in ((images, False), (flipped, True)):
                x = src
                if s != 1.0:
                    x = resize_bilinear_align_corners(
                        x, (int(h * s), int(w * s)))
                pred = resize_bilinear_align_corners(
                    apply_ss(vars_, x), (h, w))
                total = total + (pred[:, :, ::-1, :] if flip else pred)
        return total

    apply_fn = apply_ss if scope == "ss" else apply_ms
    if weights_as_args:
        return apply_fn, variables
    return (lambda images: apply_fn(variables, images)), variables


def export_artifact(args) -> None:
    import jax
    import numpy as np

    from contrastiveseg_tpu.engine.state import restore_eval_state
    from contrastiveseg_tpu.models.nets import build_model
    from contrastiveseg_tpu.presets import get_preset
    from contrastiveseg_tpu.utils.config import Config

    if args.preset:
        cfg = Config.from_args(overrides=args.overrides,
                               base=get_preset(args.preset).to_dict())
    else:
        cfg = Config.from_args(config_file=args.config,
                               overrides=args.overrides)

    model = build_model(cfg)
    h, w = (int(x) for x in args.input_size.split("x"))
    state = restore_eval_state(cfg, model, (h, w),
                               checkpoint=args.checkpoint)

    sidecar = args.weights == "sidecar"
    fwd, variables = _build_forward(cfg, model, state, args.scope,
                                    weights_as_args=sidecar)

    if args.dynamic_batch:
        (batch_dim,) = jax.export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((batch_dim, h, w, 3), np.float32)
    else:
        spec = jax.ShapeDtypeStruct((args.batch, h, w, 3), np.float32)

    platforms = args.platforms.split(",") if args.platforms else None
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    if sidecar:
        from contrastiveseg_tpu.utils.tree_io import save_tree_npz

        vspec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
        exported = jax.export.export(
            jax.jit(fwd), platforms=platforms)(vspec, spec)
        save_tree_npz(args.out + ".weights.npz", variables)
    else:
        exported = jax.export.export(
            jax.jit(fwd), platforms=platforms)(spec)
    blob = exported.serialize()

    with open(args.out + ".stablehlo", "wb") as f:
        f.write(blob)
    nz = cfg.get("normalize", default={})
    meta = {
        "model_name": cfg.get("network.model_name"),
        "backbone": cfg.get("network.backbone", default=None),
        "num_classes": cfg.get("data.num_classes"),
        "scope": args.scope,
        "input": {"shape": ["b" if args.dynamic_batch else args.batch,
                            h, w, 3],
                  "dtype": "float32", "layout": "NHWC RGB"},
        "normalize": {
            "div_value": nz.get("div_value", 255.0),
            "mean": list(nz.get("mean_value", (0.485, 0.456, 0.406))),
            "std": list(nz.get("std", (0.229, 0.224, 0.225))),
        },
        "output": "logits at input resolution (argmax -> train ids)",
        "weights": args.weights,
        "platforms": platforms or ["export-default"],
        "jax_version": jax.__version__,
        "calling_convention_version":
            exported.calling_convention_version,
    }
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    print(f"exported {len(blob) / 1e6:.1f} MB -> {args.out}.stablehlo")
    print(json.dumps(meta))


def load_artifact(args) -> None:
    import jax
    import numpy as np

    with open(args.load + ".stablehlo", "rb") as f:
        exported = jax.export.deserialize(f.read())
    with open(args.load + ".json") as f:
        meta = json.load(f)
    shape = [d if isinstance(d, int) else args.batch
             for d in meta["input"]["shape"]]
    x = np.random.default_rng(0).uniform(-2, 2, shape).astype(np.float32)
    if meta.get("weights") == "sidecar":
        from contrastiveseg_tpu.utils.tree_io import load_tree_npz

        variables = jax.device_put(load_tree_npz(args.load + ".weights.npz"))
        out = exported.call(variables, jax.numpy.asarray(x))
    else:
        out = exported.call(jax.numpy.asarray(x))
    out = np.asarray(out)
    assert np.isfinite(out).all(), "artifact produced non-finite logits"
    print(f"loaded {args.load}: input {x.shape} -> logits {out.shape}, "
          f"argmax classes {np.unique(out.argmax(-1))[:8].tolist()}...")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", default=None,
                    help="orbax checkpoint dir (omit: random init export, "
                         "useful for pipeline tests)")
    ap.add_argument("--out", default="model_artifacts/model")
    ap.add_argument("--load", default=None,
                    help="smoke-load an exported artifact instead")
    ap.add_argument("--input-size", default="512x1024")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dynamic-batch", action="store_true")
    ap.add_argument("--scope", choices=["ss", "ms"], default="ss")
    ap.add_argument("--weights", choices=["baked", "sidecar"],
                    default="baked",
                    help="baked: self-contained artifact (weights as HLO "
                         "constants); sidecar: weight-free artifact + "
                         "<out>.weights.npz passed at call time (small "
                         "compile payloads; required behind relay-fronted "
                         "TPU runtimes)")
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. tpu,cpu (default: current "
                         "backend only)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.load:
        load_artifact(args)
    else:
        export_artifact(args)


if __name__ == "__main__":
    main()
