#!/usr/bin/env python
"""Train/val CLI.

Replaces the reference main.py / main_contrastive.py (argparse +
`--configs X.json --phase train`, /root/reference/main.py:43-231).  Usage:

    python tools/train.py --preset cityscapes_hrnet_w48_contrast \
        [--config extra.json] [--phase train|val] [key.path=value ...]

Positional overrides use dotted paths (`solver.max_iters=100`).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default=None, help="preset name (presets.py)")
    ap.add_argument("--config", default=None, help="JSON config file")
    ap.add_argument("--phase", default="train", choices=["train", "val", "test"])
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--finetune", action="store_true",
                    help="finetune mode: freeze BN stats during training "
                         "(main_contrastive.py:94 declares this flag but "
                         "the reference never consumes it; here it maps "
                         "to network.freeze_bn — ModuleRunner.freeze_bn "
                         "semantics)")
    ap.add_argument("overrides", nargs="*", help="key.path=value overrides")
    args = ap.parse_args()

    if args.cpu:
        # The host sitecustomize pins jax_platforms="axon,cpu" before this
        # script runs; env vars are too late, use the config API.
        import jax

        jax.config.update("jax_platforms", "cpu")

    from contrastiveseg_tpu.presets import get_preset
    from contrastiveseg_tpu.utils.config import Config

    if args.preset:
        cfg = get_preset(args.preset)
        if args.config:
            import json

            with open(args.config) as f:
                cfg = cfg.merged(json.load(f))
        cfg = Config.from_args(overrides=args.overrides, base=cfg.to_dict())
    else:
        cfg = Config.from_args(config_file=args.config, overrides=args.overrides)
    if args.finetune:
        cfg = cfg.updated("network.freeze_bn", True)

    from contrastiveseg_tpu.engine.trainer import Trainer

    trainer = Trainer(cfg)
    if args.phase == "train":
        scores = trainer.train()
        if scores:
            print(f"final val mIoU: {scores.get('miou', float('nan')):.4f}")
    elif args.phase == "val":
        scores = trainer.validate()
        print(f"val mIoU: {scores['miou']:.4f}")
    else:
        from contrastiveseg_tpu.engine.tester import Tester

        tester = Tester(cfg, trainer.model, trainer.state)
        # SegFix nets emit boundary mask + direction (phase=test_offset in
        # the reference, tester_offset.py); everyone else writes labels.
        if cfg.get("network.model_name", default="").startswith("segfix"):
            tester.test_offset()
        else:
            tester.test()


if __name__ == "__main__":
    main()
