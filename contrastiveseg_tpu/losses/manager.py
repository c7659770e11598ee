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
        exact_sampling=cfg.get("contrast.exact_sampling", default=False),
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


@LOSSES.register("fs_auxohemce_loss")
def _fs_auxohemce(cfg):
    """OHEM on the seg head + plain CE on aux (loss_helper.py:264-281)."""
    lw = cfg.get("network.loss_weights", default={})
    params = cfg.get("loss.params", default={})
    return PlainSegLoss(
        use_aux=True,
        use_ohem=True,
        ohem_thresh=params.get("ohem_thresh", 0.9),
        ohem_minkeep=params.get("ohem_minkeep", 100000),
        aux_weight=lw.get("aux_loss", 0.4),
        seg_weight=lw.get("seg_loss", 1.0),
        **_common(cfg),
    )


@LOSSES.register("fs_auxce_dsn_loss")
def _fs_auxce_dsn(cfg):
    """Deeply-supervised: seg CE + mean CE over seg_aux* heads
    (loss_helper.py:284-298)."""
    lw = cfg.get("network.loss_weights", default={})
    return PlainSegLoss(
        dsn=True,
        aux_weight=lw.get("aux_loss", 0.4),
        seg_weight=lw.get("seg_loss", 1.0),
        **_common(cfg),
    )


def _rmi_params(cfg) -> dict:
    p = cfg.get("loss.params", default={})
    return {
        "radius": p.get("rmi_radius", 3),
        "pool_size": p.get("rmi_pool_size", 3),
        "pool_stride": p.get("rmi_pool_stride", 3),
        "pool_way": p.get("rmi_pool_way", 0),
        "weight_lambda": p.get("loss_weight_lambda", 0.5),
        "lambda_way": p.get("lambda_way", 1),
        "loss_weight": p.get("loss_weight", 1.0),
    }


def _contrast(cfg, use_aux: bool):
    lw = cfg.get("network.loss_weights", default={})
    kind = "ce"
    if cfg.get("contrast.use_rmi", default=False):
        kind = "rmi"
    elif cfg.get("contrast.use_lovasz", default=False):
        kind = "lovasz"
    return ContrastCELoss(
        spec=_contrast_spec(cfg),
        loss_weight=cfg.get("contrast.loss_weight", default=0.1),
        use_aux=use_aux,
        aux_weight=lw.get("aux_loss", 0.4),
        seg_weight=lw.get("seg_loss", 1.0),
        include_class0=cfg.get("contrast.include_class0", default=True),
        seg_loss_kind=kind,
        rmi_params=_rmi_params(cfg) if kind == "rmi" else None,
        kernel=cfg.get("contrast.kernel", default="auto"),
        ce_precision=cfg.get("loss.ce_precision", default="default"),
        **_common(cfg),
    )


@LOSSES.register("contrast_ce_loss")
def _contrast_ce(cfg):
    return _contrast(cfg, use_aux=False)


@LOSSES.register("contrast_auxce_loss")
def _contrast_auxce(cfg):
    return _contrast(cfg, use_aux=True)


class _RMISegLoss:
    """fs_rmi_loss / fs_aux_rmi_loss / rmi_loss wrappers."""

    def __init__(self, cfg, use_aux: bool):
        self.params = _rmi_params(cfg)
        self.num_classes = cfg.get("data.num_classes")
        self.use_aux = use_aux
        lw = cfg.get("network.loss_weights", default={})
        self.aux_weight = lw.get("aux_loss", 0.4)
        self.seg_weight = lw.get("seg_loss", 1.0)
        c = _common(cfg)
        self.class_weight = c["class_weight"]
        self.ignore_index = c["ignore_index"]

    def __call__(self, key, outputs, targets, with_embed=True, bank=None):
        import jax.numpy as jnp

        from contrastiveseg_tpu.losses.ce import cross_entropy
        from contrastiveseg_tpu.losses.rmi import rmi_loss
        from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners

        h, w = targets.shape[1], targets.shape[2]
        seg = outputs["seg"]
        if seg.shape[1:3] != (h, w):
            seg = resize_bilinear_align_corners(seg, (h, w))
        loss = rmi_loss(seg, targets, self.num_classes, **self.params)
        if self.use_aux and "seg_aux" in outputs:
            aux = outputs["seg_aux"]
            if aux.shape[1:3] != (h, w):
                aux = resize_bilinear_align_corners(aux, (h, w))
            loss = self.seg_weight * loss + self.aux_weight * cross_entropy(
                aux, targets, self.class_weight, self.ignore_index
            )
        return loss, {"loss_seg": loss, "loss": loss}


@LOSSES.register("rmi_loss")
@LOSSES.register("fs_rmi_loss")
def _fs_rmi(cfg):
    return _RMISegLoss(cfg, use_aux=False)


@LOSSES.register("fs_aux_rmi_loss")
def _fs_aux_rmi(cfg):
    return _RMISegLoss(cfg, use_aux=True)


class _LovaszSegLoss:
    def __init__(self, cfg):
        c = _common(cfg)
        self.class_weight = c["class_weight"]
        self.ignore_index = c["ignore_index"]

    def __call__(self, key, outputs, targets, with_embed=True, bank=None):
        from contrastiveseg_tpu.losses.lovasz import ce_lovasz_loss
        from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners

        h, w = targets.shape[1], targets.shape[2]
        seg = outputs["seg"]
        if seg.shape[1:3] != (h, w):
            seg = resize_bilinear_align_corners(seg, (h, w))
        loss = ce_lovasz_loss(seg, targets, self.class_weight,
                              self.ignore_index)
        return loss, {"loss_seg": loss, "loss": loss}


@LOSSES.register("fs_ce_lovasz_loss")
def _fs_ce_lovasz(cfg):
    return _LovaszSegLoss(cfg)


# mem variants share the same callable; the trainer passes the MemoryBank.
@LOSSES.register("mem_contrast_ce_loss")
def _mem_contrast_ce(cfg):
    return _contrast(cfg, use_aux=False)


@LOSSES.register("mem_contrast_auxce_loss")
def _mem_contrast_auxce(cfg):
    return _contrast(cfg, use_aux=True)


class _MsAuxRMILoss:
    """ms_fs_aux_rmi_loss for MscaleOCR (reference nets/ms_ocrnet.py output
    contract): RMI on the fused prediction + aux CE + scale-consistency CE
    on the 0.5x/1.0x branch predictions."""

    def __init__(self, cfg):
        self.rmi = _RMISegLoss(cfg, use_aux=True)
        c = _common(cfg)
        self.class_weight = c["class_weight"]
        self.ignore_index = c["ignore_index"]
        self.scale_weight = cfg.get("loss.params.ms_scale_weight",
                                    default=0.05)

    def __call__(self, key, outputs, targets, with_embed=True, bank=None):
        from contrastiveseg_tpu.losses.ce import cross_entropy

        loss, metrics = self.rmi(key, outputs, targets)
        for k in ("pred_05x", "pred_10x"):
            if k in outputs:
                loss = loss + self.scale_weight * cross_entropy(
                    outputs[k], targets, self.class_weight, self.ignore_index
                )
        metrics["loss"] = loss
        return loss, metrics


@LOSSES.register("ms_fs_aux_rmi_loss")
def _ms_aux_rmi(cfg):
    return _MsAuxRMILoss(cfg)


@LOSSES.register("segfix_loss")
def _segfix(cfg):
    from contrastiveseg_tpu.losses.segfix import SegFixLoss

    return SegFixLoss(
        num_directions=cfg.get("data.dt_num_classes", default=8),
        mask_threshold=cfg.get("loss.params.mask_threshold", default=0.5),
        mask_weight=cfg.get("loss.params.mask_weight", default=1.0),
        direction_weight=cfg.get("loss.params.direction_weight", default=1.0),
    )


def build_loss(cfg):
    """LossManager.get_seg_loss equivalent (loss_manager.py:45-68)."""
    return LOSSES.build(cfg.get("loss.loss_type"), cfg)
