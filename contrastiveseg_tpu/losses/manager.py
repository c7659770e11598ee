"""Loss registry keyed by the reference's loss_type strings.

Reference: SEG_LOSS_DICT (lib/loss/loss_manager.py:27-42).  Every entry
builds a pure callable ``loss(key, outputs, targets, with_embed, bank) ->
(total, metrics)`` from a Config.
"""

from __future__ import annotations

from contrastiveseg_tpu.losses.contrast import ContrastCELoss, PlainSegLoss
from contrastiveseg_tpu.ops.contrast import ContrastSpec
from contrastiveseg_tpu.utils.registry import Registry

LOSSES = Registry("losses")


def _common(cfg):
    params = cfg.get("loss.params", default={})
    cw = params.get("ce_weight")
    return {
        "class_weight": tuple(cw) if cw else None,
        "ignore_index": params.get("ce_ignore_index", -1),
    }


def _contrast_spec(cfg) -> ContrastSpec:
    return ContrastSpec(
        num_classes=cfg.get("data.num_classes"),
        max_samples=cfg.get("contrast.max_samples", default=1024),
        max_views=cfg.get("contrast.max_views", default=100),
        temperature=cfg.get("contrast.temperature", default=0.1),
        base_temperature=cfg.get("contrast.base_temperature", default=0.07),
        ignore_label=_common(cfg)["ignore_index"],
    )


@LOSSES.register("fs_ce_loss")
def _fs_ce(cfg):
    return PlainSegLoss(**_common(cfg))


@LOSSES.register("fs_ohemce_loss")
def _fs_ohem(cfg):
    params = cfg.get("loss.params", default={})
    return PlainSegLoss(
        use_ohem=True,
        ohem_thresh=params.get("ohem_thresh", 0.9),
        ohem_minkeep=params.get("ohem_minkeep", 100000),
        **_common(cfg),
    )


@LOSSES.register("fs_auxce_loss")
def _fs_auxce(cfg):
    lw = cfg.get("network.loss_weights", default={})
    return PlainSegLoss(
        use_aux=True,
        aux_weight=lw.get("aux_loss", 0.4),
        seg_weight=lw.get("seg_loss", 1.0),
        **_common(cfg),
    )


def _contrast(cfg, use_aux: bool):
    lw = cfg.get("network.loss_weights", default={})
    return ContrastCELoss(
        spec=_contrast_spec(cfg),
        loss_weight=cfg.get("contrast.loss_weight", default=0.1),
        use_aux=use_aux,
        aux_weight=lw.get("aux_loss", 0.4),
        seg_weight=lw.get("seg_loss", 1.0),
        include_class0=cfg.get("contrast.include_class0", default=True),
        **_common(cfg),
    )


@LOSSES.register("contrast_ce_loss")
def _contrast_ce(cfg):
    return _contrast(cfg, use_aux=False)


@LOSSES.register("contrast_auxce_loss")
def _contrast_auxce(cfg):
    return _contrast(cfg, use_aux=True)


# mem variants share the same callable; the trainer passes the MemoryBank.
@LOSSES.register("mem_contrast_ce_loss")
def _mem_contrast_ce(cfg):
    return _contrast(cfg, use_aux=False)


@LOSSES.register("mem_contrast_auxce_loss")
def _mem_contrast_auxce(cfg):
    return _contrast(cfg, use_aux=True)


def build_loss(cfg):
    """LossManager.get_seg_loss equivalent (loss_manager.py:45-68)."""
    return LOSSES.build(cfg.get("loss.loss_type"), cfg)
