"""Composite contrast+CE training losses.

Re-implements ContrastCELoss / ContrastAuxCELoss
(/root/reference/lib/loss/loss_contrast.py:150-234, loss_contrast_mem.py:174-231)
as pure functions.  The warmup gate keeps the reference's semantics — the
contrast term is always computed and scaled by 0 before warmup
(`loss + 0 * loss_contrast`, loss_contrast.py:189); under jit this costs one
multiply and keeps the compiled graph static across the warmup boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from contrastiveseg_tpu.losses.ce import aux_cross_entropy, cross_entropy
from contrastiveseg_tpu.ops.contrast import ContrastSpec, pixel_contrast_loss
from contrastiveseg_tpu.ops.queue import MemoryBank, bank_as_contrast_set
from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners


@dataclasses.dataclass(frozen=True)
class ContrastCELoss:
    """`contrast_ce_loss` / `mem_contrast_ce_loss` (with bank passed)."""

    spec: ContrastSpec
    loss_weight: float = 0.1
    class_weight: Optional[tuple[float, ...]] = None
    ignore_index: int = -1
    use_aux: bool = False
    aux_weight: float = 0.4
    seg_weight: float = 1.0
    include_class0: bool = True
    seg_loss_kind: str = "ce"  # ce | rmi | lovasz (contrast.use_rmi/use_lovasz)
    rmi_params: Optional[dict] = None
    kernel: str = "auto"  # auto | pallas | stream (mem-queue InfoNCE impl)
    # MXU passes for the streamed-CE upsample einsums.  "default" =
    # single-pass bf16 multiplies with fp32 accumulation — the TPU fast
    # path (5.0 -> 1.1 ms/call at the headline shape, BENCH_NOTES_r05.md):
    # the model computes seg in bf16 anyway, so bf16 interp taps add no new
    # information loss.  CPU executes exact fp32 at every precision, so
    # parity tests are unaffected.  loss.ce_precision=highest restores
    # exact-fp32 interpolation on TPU.
    ce_precision: str = "default"

    def __call__(
        self,
        key: jax.Array,
        outputs: dict[str, jnp.ndarray],
        targets: jnp.ndarray,  # [B, H, W] int labels at full res
        with_embed: jnp.ndarray | bool = True,
        bank: Optional[MemoryBank] = None,
    ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
        h, w = targets.shape[1], targets.shape[2]
        seg = outputs["seg"]  # [B, h/s, w/s, C] stride-level logits
        embed = outputs["embed"]

        if self.seg_loss_kind == "ce" and not self.use_aux:
            # Memory-streamed path: never materializes full-res logits.
            from contrastiveseg_tpu.losses.ce import upsampled_cross_entropy

            seg_loss = upsampled_cross_entropy(
                seg, targets, self.class_weight, self.ignore_index,
                precision=self.ce_precision,
            )
            return self._finish(key, outputs, targets, with_embed, bank,
                                seg, embed, seg_loss)

        pred_full = resize_bilinear_align_corners(seg, (h, w))
        if self.seg_loss_kind == "rmi":
            from contrastiveseg_tpu.losses.rmi import rmi_loss

            seg_loss = rmi_loss(
                pred_full, targets, pred_full.shape[-1],
                **(self.rmi_params or {}),
            )
            if self.use_aux:
                aux_full = resize_bilinear_align_corners(
                    outputs["seg_aux"], (h, w)
                )
                seg_loss = self.seg_weight * seg_loss + (
                    self.aux_weight
                    * cross_entropy(aux_full, targets, self.class_weight,
                                    self.ignore_index)
                )
        elif self.seg_loss_kind == "lovasz":
            from contrastiveseg_tpu.losses.lovasz import ce_lovasz_loss

            seg_loss = ce_lovasz_loss(
                pred_full, targets, self.class_weight, self.ignore_index
            )
        elif self.use_aux:
            aux_full = resize_bilinear_align_corners(outputs["seg_aux"], (h, w))
            seg_loss = aux_cross_entropy(
                pred_full, aux_full, targets,
                seg_weight=self.seg_weight, aux_weight=self.aux_weight,
                class_weight=self.class_weight, ignore_index=self.ignore_index,
            )
        else:
            seg_loss = cross_entropy(
                pred_full, targets, self.class_weight, self.ignore_index
            )

        return self._finish(key, outputs, targets, with_embed, bank,
                            seg, embed, seg_loss)

    def _finish(self, key, outputs, targets, with_embed, bank, seg, embed,
                seg_loss):
        predict = jnp.argmax(seg, axis=-1).astype(jnp.int32)
        if bank is not None:
            q_f, q_l, q_v = bank_as_contrast_set(bank, self.include_class0)
            # Large queues ([C*2M, D]) go through the streaming two-pass
            # loss: the [max_samples, C*2M] logits never materialize.
            from contrastiveseg_tpu.ops.contrast import hard_anchor_sample
            from contrastiveseg_tpu.ops.contrast_stream import (
                streaming_contrastive_loss,
            )
            from contrastiveseg_tpu.ops.resize import scale_target_nearest

            B, H, W, D = embed.shape
            labels_s = scale_target_nearest(targets, (H, W)).reshape(B, H * W)
            anchors = hard_anchor_sample(
                key, embed.reshape(B, H * W, D), labels_s,
                predict.reshape(B, H * W), self.spec,
            )
            use_pallas = self.kernel == "pallas" or (
                self.kernel == "auto" and jax.default_backend() == "tpu"
            )
            if use_pallas:
                from contrastiveseg_tpu.ops.contrast_pallas import (
                    pallas_contrastive_loss,
                )

                contrast = pallas_contrastive_loss(
                    anchors.feats, anchors.labels, anchors.valid,
                    jax.lax.stop_gradient(q_f), q_l, q_v,
                    self.spec.temperature, self.spec.base_temperature,
                )
            else:
                contrast = streaming_contrastive_loss(
                    anchors.feats, anchors.labels, anchors.valid,
                    jax.lax.stop_gradient(q_f), q_l, q_v,
                    self.spec.temperature, self.spec.base_temperature,
                )
        else:
            contrast = pixel_contrast_loss(
                key, embed, targets, predict, self.spec
            )
        gate = jnp.asarray(with_embed, jnp.float32)
        total = seg_loss + gate * self.loss_weight * contrast
        return total, {
            "loss_seg": seg_loss,
            "loss_contrast": contrast,
            "loss": total,
        }


@dataclasses.dataclass(frozen=True)
class PlainSegLoss:
    """fs_ce_loss / fs_auxce_loss / fs_auxohemce_loss / fs_auxce_dsn_loss
    on full-resolution (or upsampled) logits.

    ``use_aux + use_ohem`` = FSAuxOhemCELoss (OHEM on the seg head, plain
    CE on aux — loss_helper.py:264-281); ``dsn`` = FSAuxCELossDSN (seg CE
    + mean CE over the seg_aux1..3 deeply-supervised heads,
    loss_helper.py:284-298).
    """

    class_weight: Optional[tuple[float, ...]] = None
    ignore_index: int = -1
    use_aux: bool = False
    aux_weight: float = 0.4
    seg_weight: float = 1.0
    use_ohem: bool = False
    ohem_thresh: float = 0.9
    ohem_minkeep: int = 100000
    dsn: bool = False

    def __call__(
        self,
        key: jax.Array,
        outputs: dict[str, jnp.ndarray],
        targets: jnp.ndarray,
        with_embed: jnp.ndarray | bool = True,
        bank: Optional[MemoryBank] = None,
    ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
        del key, with_embed, bank
        h, w = targets.shape[1], targets.shape[2]

        def at_label_res(x):
            if x.shape[1:3] != (h, w):
                return resize_bilinear_align_corners(x, (h, w))
            return x

        seg = at_label_res(outputs["seg"])
        if self.use_ohem:
            from contrastiveseg_tpu.losses.ce import ohem_cross_entropy

            seg_loss = ohem_cross_entropy(
                seg, targets, self.ohem_thresh, self.ohem_minkeep,
                self.class_weight, self.ignore_index,
            )
        else:
            seg_loss = cross_entropy(
                seg, targets, self.class_weight, self.ignore_index)

        if self.dsn:
            aux_keys = sorted(k for k in outputs if k.startswith("seg_aux"))
            aux_losses = [
                cross_entropy(at_label_res(outputs[k]), targets,
                              self.class_weight, self.ignore_index)
                for k in aux_keys
            ]
            aux_loss = sum(aux_losses) / max(len(aux_losses), 1)
            loss = self.seg_weight * seg_loss + self.aux_weight * aux_loss
        elif self.use_aux and "seg_aux" in outputs:
            aux_loss = cross_entropy(
                at_label_res(outputs["seg_aux"]), targets,
                self.class_weight, self.ignore_index)
            loss = self.seg_weight * seg_loss + self.aux_weight * aux_loss
        else:
            loss = seg_loss
        return loss, {"loss_seg": loss, "loss": loss}
