#!/usr/bin/env python
"""Import a torch checkpoint (ImageNet backbone or reference-trained model)
into this framework's flax variable format.

Reference counterpart: ModuleHelper.load_model's per-arch key remapping
(/root/reference/lib/models/tools/module_helper.py:124-235) and
ModuleRunner's checkpoint-layout handling (segmentor/tools/module_runner.py:
78-119).  Usage:

    # Full reference-trained segmentor (HRNet-W48 contrast family):
    python tools/import_torch_ckpt.py --ckpt hrnet_contrast_latest.pth \
        --model hrnet_w48_contrast --num-classes 19 --out weights.msgpack

    # ImageNet-pretrained HRNet backbone (hrnetv2_w48_imagenet_pretrained.pth):
    python tools/import_torch_ckpt.py --ckpt hrnetv2_w48.pth \
        --model hrnet_w48_contrast --num-classes 19 --source imagenet \
        --out weights.msgpack

Then train with `network.pretrained=weights.msgpack`.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ImageNet classification-head modules that have no segmentation counterpart
# (hrnet_backbone.py:356-412 `keep_imagenet_head` path + torchvision fc).
_IMAGENET_HEAD_PREFIXES = (
    "incre_modules", "downsamp_modules", "final_layer", "classifier", "fc.")


def load_torch_state(path: str) -> dict:
    """Read a .pth into {key: np.ndarray}, handling the reference's three
    checkpoint layouts (raw state_dict / {'state_dict': ...} / {'model': ...})
    and the 'module.' DDP prefix."""
    import torch

    from contrastiveseg_tpu.utils.torch_import import strip_prefixes

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    elif isinstance(blob, dict) and "model" in blob:
        blob = blob["model"]
    sd = {k: v.detach().cpu().numpy() for k, v in blob.items()
          if hasattr(v, "detach")}
    return strip_prefixes(sd, prefixes=("module.",))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="torch .pth checkpoint")
    ap.add_argument("--model", default="hrnet_w48_contrast",
                    help="registry model name to initialize")
    ap.add_argument("--num-classes", type=int, default=19)
    ap.add_argument("--proj-dim", type=int, default=256)
    ap.add_argument("--source", choices=["seg", "imagenet"], default="seg",
                    help="'seg': full reference segmentor ckpt; 'imagenet': "
                         "backbone-only pretrained ckpt (heads stay at init)")
    ap.add_argument("--out", required=True, help="output .msgpack path")
    ap.add_argument("--mapper", default=None,
                    help="override PATH_MAPPERS choice (default: derived "
                         "from --model, incl. the OCR family)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from contrastiveseg_tpu.models.nets import MODELS
    from contrastiveseg_tpu.utils.config import Config
    from contrastiveseg_tpu.utils import torch_import as ti

    is_deeplab = args.model.startswith("deeplab")
    cfg = Config({
        "data": {"num_classes": args.num_classes},
        "network": {"model_name": args.model,
                    "backbone": ("deepbase_resnet101_dilated8"
                                 if is_deeplab else "hrnet48")},
        "contrast": {"proj_dim": args.proj_dim},
    })
    model = MODELS.build(args.model, cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((1, 65, 65, 3), jnp.float32), train=True)

    sd = load_torch_state(args.ckpt)
    if args.source == "imagenet":
        sd = {f"backbone.{k}": v for k, v in sd.items()
              if not k.startswith(_IMAGENET_HEAD_PREFIXES)}
        if is_deeplab and not any(k.startswith("backbone.resinit")
                                  for k in sd):
            # torchvision-style resnet ckpts: conv1/bn1 -> resinit.conv1/bn1.
            sd = {k.replace("backbone.conv1.", "backbone.resinit.conv1.")
                  .replace("backbone.bn1.", "backbone.resinit.bn1."): v
                  for k, v in sd.items()}

    queues = ti.extract_memory_queues(sd)
    mapper = args.mapper or ti.mapper_for_model(args.model)
    newvars, report = ti.convert_state_dict(variables, sd, mapper,
                                            strict=True)
    print(f"loaded {len(report['loaded'])} leaves; "
          f"kept-at-init {len(report['missing'])}; "
          f"unused torch keys {len(report['unused'])}")
    if args.source == "seg" and report["missing"]:
        print("WARNING: unsourced flax leaves (first 10):")
        for m in report["missing"][:10]:
            print("  ", m)
    ti.save_variables(newvars, args.out)
    print(f"wrote {args.out}")
    if queues is not None:
        # HRNet_W48_MEM queue buffers -> a sidecar the trainer can seed
        # its MemoryBank from (engine/state.py).
        import flax.serialization

        qpath = args.out + ".queues.msgpack"
        with open(qpath, "wb") as f:
            f.write(flax.serialization.msgpack_serialize(queues))
        print(f"wrote memory queues ({queues['segment_queue'].shape}) "
              f"to {qpath}")


if __name__ == "__main__":
    main()
