"""Offline inference / submission writer.

Re-implements the reference Tester (/root/reference/segmentor/tester.py:93-575):
modes ``ss_test`` (single scale), ``ms_test`` (multi-scale + horizontal
flip), ``sscrop_test`` / ``mscrop_test`` (sliding-window crops), writing
label PNGs, palette-colorized visualizations, and optional prob ``.npy``.

TPU design: one jitted forward per (scale-rounded) input shape; scale
resizing and logit fusion run on device with align-corners bilinear ops;
the sliding-window grid is static per image size (stride = crop size with a
final remainder window, tester.py:525-533), so each crop reuses the same
compiled program.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners
from contrastiveseg_tpu.utils.logging import get_logger
from contrastiveseg_tpu.utils.palette import colorize, get_palette


def _decide_intersection(total: int, crop: int) -> list[int]:
    stride = crop
    starts = [stride * i for i in range((total - crop) // stride + 1)] or [0]
    if total - starts[-1] > crop:
        starts.append(total - crop)
    return starts


class Tester:
    def __init__(self, cfg, model, state):
        self.cfg = cfg
        self.model = model
        self.state = state
        self.log = get_logger()
        self.num_classes = cfg.get("data.num_classes")
        self._fwd = jax.jit(self._forward)

    def _forward(self, images: jnp.ndarray) -> jnp.ndarray:
        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        out = self.model.apply(variables, images, train=False)
        seg = out["seg"] if isinstance(out, dict) else out
        return seg

    # -- inference modes (logits at input resolution) ---------------------
    def ss_test(self, images: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
        """tester.py:310-327: scale -> forward -> upsample back."""
        n, h, w, _ = images.shape
        if scale != 1.0:
            images = resize_bilinear_align_corners(
                images, (int(h * scale), int(w * scale))
            )
        seg = self._fwd(images)
        return resize_bilinear_align_corners(seg, (h, w))

    def ms_test(self, images: jnp.ndarray) -> jnp.ndarray:
        """tester.py:380-398: sum over scales of logits + flipped logits."""
        scales = self.cfg.get("test.scale_search", default=[0.75, 1.0, 1.25])
        weights = self.cfg.get("test.scale_weights", default=None)
        total = jnp.zeros(
            (*images.shape[:3], self.num_classes), jnp.float32
        )
        flipped = images[:, :, ::-1, :]
        for i, s in enumerate(scales):
            probs = self.ss_test(images, s)
            flip_probs = self.ss_test(flipped, s)[:, :, ::-1, :]
            contrib = probs + flip_probs
            total = total + (weights[i] * contrib if weights else contrib)
        return total

    def sscrop_test(self, images: jnp.ndarray, crop_size: tuple[int, int],
                    scale: float = 1.0) -> jnp.ndarray:
        """tester.py:351-378: sliding-window accumulate logits / counts.
        crop_size is (h, w)."""
        n, ori_h, ori_w, _ = images.shape
        scaled = (
            resize_bilinear_align_corners(
                images, (int(ori_h * scale), int(ori_w * scale))
            )
            if scale != 1.0 else images
        )
        h, w = scaled.shape[1], scaled.shape[2]
        ch, cw = min(crop_size[0], h), min(crop_size[1], w)
        full = jnp.zeros((n, h, w, self.num_classes), jnp.float32)
        count = jnp.zeros((n, h, w, 1), jnp.float32)
        for y0 in _decide_intersection(h, ch):
            for x0 in _decide_intersection(w, cw):
                crop = scaled[:, y0:y0 + ch, x0:x0 + cw, :]
                pred = self.ss_test(crop)
                full = full.at[:, y0:y0 + ch, x0:x0 + cw, :].add(pred)
                count = count.at[:, y0:y0 + ch, x0:x0 + cw, :].add(1.0)
        full = full / count
        return resize_bilinear_align_corners(full, (ori_h, ori_w))

    def mscrop_test(self, images: jnp.ndarray,
                    crop_size: tuple[int, int]) -> jnp.ndarray:
        scales = self.cfg.get("test.scale_search", default=[0.75, 1.0, 1.25])
        total = jnp.zeros(
            (*images.shape[:3], self.num_classes), jnp.float32
        )
        flipped = images[:, :, ::-1, :]
        for s in scales:
            total = total + self.sscrop_test(images, crop_size, s)
            total = total + self.sscrop_test(flipped, crop_size, s)[:, :, ::-1, :]
        return total

    def _denormalize(self, images: np.ndarray) -> np.ndarray:
        """Normalized model input -> uint8 RGB (for CRF appearance terms)."""
        nz = self.cfg.get("normalize", default={})
        from contrastiveseg_tpu.data.transforms import Normalizer

        norm = Normalizer(
            div_value=nz.get("div_value", 255.0),
            mean=nz.get("mean", (0.485, 0.456, 0.406)),
            std=nz.get("std", (0.229, 0.224, 0.225)),
        )
        return norm.denormalize(images).astype(np.uint8)

    def crf_ss_test(self, images: jnp.ndarray) -> jnp.ndarray:
        """tester.py:164-167,535-575: ss_test + DenseCRF refinement.

        Uses ops/crf.mean_field_crf (pydensecrf-free mean-field, documented
        approximation) with the reference's hyperparameters (pos_xy_std=1,
        pos_w=3, bi_xy_std=10, bi_rgb_std=3, bi_w=4, iter_max=10).
        """
        from contrastiveseg_tpu.ops.crf import mean_field_crf

        logits = self.ss_test(images)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        rgb = self._denormalize(np.asarray(images))
        refined = np.stack([
            mean_field_crf(
                probs[i], rgb[i], iters=10,
                sxy_gaussian=1.0, compat_gaussian=3.0,
                sxy_bilateral=10.0, srgb=3.0, compat_bilateral=4.0,
            )
            for i in range(probs.shape[0])
        ])
        return jnp.asarray(refined)

    def ms_test_depth(self, images: jnp.ndarray,
                      metas: Optional[list] = None) -> jnp.ndarray:
        """tester.py:425-475: depth-weighted multi-scale fusion.

        Per-scale fused (orig+flip) probs are weighted per pixel by
        POWER_BASE ** |depth_bin - scale_index| where depth bins come from
        a stereo disparity PNG (`test.stereo_path/<name>.png`, 16-bit,
        depth = 500 * 0.5/(raw/256), clipped to MAX_DEPTH=63).  Images with
        no depth map fall back to uniform weights (= ms_test).
        """
        MAX_DEPTH, POWER_BASE = 63, 0.8
        scales = self.cfg.get("test.scale_search", default=[0.75, 1.0, 1.25])
        stereo_path = self.cfg.get("test.stereo_path", default=None)
        n, h, w, _ = images.shape
        flipped = images[:, :, ::-1, :]
        prob_list = [
            np.asarray(self.ss_test(images, s))
            + np.asarray(self.ss_test(flipped, s))[:, :, ::-1, :]
            for s in scales
        ]

        full = np.zeros((n, h, w, self.num_classes), np.float32)
        for i in range(n):
            depth_bins = None
            name = (metas[i] or {}).get("name") if metas else None
            if stereo_path and name:
                p = os.path.join(stereo_path, f"{name}.png")
                if os.path.exists(p):
                    raw = np.asarray(Image.open(p)).astype(np.float64)
                    depth = 500.0 * (0.5 / np.maximum(raw / 256.0, 1e-6))
                    depth = np.clip(depth, 0, MAX_DEPTH)
                    depth_bins = depth // (MAX_DEPTH // len(scales))
                    if depth_bins.shape != (h, w):
                        depth_bins = np.asarray(
                            Image.fromarray(depth_bins).resize(
                                (w, h), Image.NEAREST)
                        )
            for si, prob in enumerate(prob_list):
                if depth_bins is None:
                    weight = 1.0
                else:
                    weight = (POWER_BASE ** np.abs(depth_bins - si)).astype(
                        np.float32)[..., None]
                full[i] += weight * prob[i]
        return jnp.asarray(full)

    def infer(self, images: jnp.ndarray,
              metas: Optional[list] = None) -> jnp.ndarray:
        mode = self.cfg.get("test.mode", default="ss_test")
        if mode == "ss_test":
            return self.ss_test(images)
        if mode == "ms_test":
            return self.ms_test(images)
        if mode == "ms_test_depth":
            return self.ms_test_depth(images, metas)
        if mode == "crf_ss_test":
            return self.crf_ss_test(images)
        if mode in ("sscrop_test", "mscrop_test"):
            cw, ch = self.cfg.get("test.crop_size", default=[1024, 512])
            fn = self.sscrop_test if mode == "sscrop_test" else self.mscrop_test
            return fn(images, (ch, cw))
        raise NotImplementedError(f"test mode {mode!r}")

    # -- output writing ----------------------------------------------------
    def _to_raw_ids(self, pred: np.ndarray) -> np.ndarray:
        """Train ids -> submission ids (tester.py:176-207 inverse relabel)."""
        if self.cfg.get("data.reduce_zero_label", default=False):
            pred = pred + 1
        label_list = self.cfg.get("data.label_list", default=None)
        if label_list:
            out = pred.copy()
            for train_id, raw_id in enumerate(label_list):
                out[pred == train_id] = raw_id
            pred = out
        return pred

    def test_offset(self, batches: Optional[Iterable[dict]] = None,
                    out_dir: Optional[str] = None) -> int:
        """SegFix offset-prediction test (reference tester_offset.py,
        phase=test_offset): run the segfix net, write per-image ``.npz``
        files with the predicted boundary ``mask`` and ``dir_label`` that
        tools/segfix.py consumes."""
        from contrastiveseg_tpu.data.pipeline import build_pipeline

        out_dir = out_dir or self.cfg.get("test.out_dir", default="./out")
        offset_dir = os.path.join(out_dir, "offset")
        os.makedirs(offset_dir, exist_ok=True)

        @jax.jit
        def fwd(images):
            variables = {"params": self.state.params}
            if self.state.batch_stats:
                variables["batch_stats"] = self.state.batch_stats
            out = self.model.apply(variables, images, train=False)
            return out["mask"], out["dir"]

        if batches is None:
            pipe = build_pipeline(self.cfg, "test")
            batches = pipe.epoch_iter(0)

        n = 0
        for batch in batches:
            mask_l, dir_l = fwd(jnp.asarray(batch["image"]))
            for i, meta in enumerate(batch["meta"]):
                ow, oh = meta["ori_size"]
                m = resize_bilinear_align_corners(mask_l[i:i + 1], (oh, ow))[0]
                d = resize_bilinear_align_corners(dir_l[i:i + 1], (oh, ow))[0]
                mask = np.argmax(np.asarray(m), -1).astype(np.uint8)
                dir_label = np.argmax(np.asarray(d), -1).astype(np.uint8)
                name = meta.get("name", f"img_{n:06d}")
                np.savez(os.path.join(offset_dir, f"{name}.npz"),
                         mask=mask, dir_label=dir_label)
                n += 1
        self.log.info(f"wrote {n} offset predictions to {offset_dir}")
        return n

    def test(self, batches: Optional[Iterable[dict]] = None,
             out_dir: Optional[str] = None, save_prob: bool = False) -> int:
        from contrastiveseg_tpu.data.pipeline import build_pipeline

        out_dir = out_dir or self.cfg.get("test.out_dir", default="./out")
        label_dir = os.path.join(out_dir, "label")
        vis_dir = os.path.join(out_dir, "vis")
        os.makedirs(label_dir, exist_ok=True)
        os.makedirs(vis_dir, exist_ok=True)
        palette = get_palette(
            self.cfg.get("dataset", default=""), self.num_classes
        )
        if batches is None:
            pipe = build_pipeline(self.cfg, "test")
            batches = pipe.epoch_iter(0)

        n = 0
        for batch in batches:
            logits = np.asarray(
                self.infer(jnp.asarray(batch["image"]), batch.get("meta"))
            )
            for i, meta in enumerate(batch["meta"]):
                ow, oh = meta["ori_size"]
                img_logits = logits[i]
                if img_logits.shape[:2] != (oh, ow):
                    img_logits = np.asarray(
                        resize_bilinear_align_corners(
                            jnp.asarray(img_logits[None]), (oh, ow)
                        )
                    )[0]
                pred = np.argmax(img_logits, axis=-1).astype(np.int32)
                name = meta.get("name", f"img_{n:06d}")
                Image.fromarray(
                    self._to_raw_ids(pred).astype(np.uint8)
                ).save(os.path.join(label_dir, f"{name}.png"))
                Image.fromarray(colorize(pred, palette)).save(
                    os.path.join(vis_dir, f"{name}.png")
                )
                # save_gt_label env flag (reference tester.py:209-217,
                # SURVEY.md §5): also colorize the ground-truth map into
                # gt_vis/ when labels ride along with the batch.
                if self.cfg.get("test.save_gt_label", default=False) and (
                    "label" in batch
                ):
                    gt = np.asarray(batch["label"][i]).astype(np.int32)
                    gt_dir = os.path.join(out_dir, "gt_vis")
                    os.makedirs(gt_dir, exist_ok=True)
                    Image.fromarray(colorize(np.maximum(gt, 0), palette)).save(
                        os.path.join(gt_dir, f"{name}.png")
                    )
                if save_prob:
                    np.save(
                        os.path.join(out_dir, f"{name}_prob.npy"),
                        jax.nn.softmax(jnp.asarray(img_logits), axis=-1),
                    )
                n += 1
        self.log.info(f"wrote {n} predictions to {out_dir}")
        return n
