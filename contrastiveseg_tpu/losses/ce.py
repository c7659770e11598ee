"""Cross-entropy loss family with exact torch semantics.

Re-implements FSCELoss / FSOhemCELoss / FSAuxCELoss
(/root/reference/lib/loss/loss_helper.py:169-313) as pure functions.

Torch semantics preserved:
  * per-class weights: mean reduction divides by the *sum of weights* of
    the contributing pixels (``nn.CrossEntropyLoss(weight=w)``);
  * ignore_index pixels contribute neither numerator nor denominator;
  * targets are nearest-downscaled to logits size (``_scale_target``,
    loss_helper.py:208-212) — here the caller passes logits already at
    label resolution or we rescale internally.

All functions take NHWC logits [B, H, W, C] and integer labels [B, H, W].
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from contrastiveseg_tpu.ops.resize import scale_target_nearest


def _per_pixel_ce(
    logits: jnp.ndarray, labels: jnp.ndarray, class_weight: Optional[jnp.ndarray],
    ignore_index: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (weighted_ce [B,H,W], weight [B,H,W], valid [B,H,W]).

    TPU note: the label lookup is a masked one-hot reduction, NOT a gather
    (``take_along_axis`` over the full-res [B,H,W,C] logits lowers to a
    scalar gather costing ~65ms/step on v5e; the select+reduce fuses into
    the softmax at ~1ms).
    """
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe = jnp.clip(labels, 0, num_classes - 1)
    onehot = safe[..., None] == jnp.arange(num_classes, dtype=safe.dtype)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    if class_weight is not None:
        cw = jnp.asarray(class_weight, jnp.float32)
        w = jnp.sum(jnp.where(onehot, cw, 0.0), axis=-1)
    else:
        w = jnp.ones_like(nll)
    w = jnp.where(valid, w, 0.0)
    return nll * w, w, valid


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weight: Optional[Sequence[float]] = None,
    ignore_index: int = -1,
    reduction: str = "mean",
) -> jnp.ndarray:
    """FSCELoss: weighted CE, ignore-index, torch 'mean' normalization."""
    if logits.shape[1:3] != labels.shape[1:3]:
        labels = scale_target_nearest(labels, (logits.shape[1], logits.shape[2]))
    wce, w, _ = _per_pixel_ce(logits, labels, class_weight, ignore_index)
    if reduction == "sum":
        return jnp.sum(wce)
    return jnp.sum(wce) / jnp.maximum(jnp.sum(w), 1e-12)


def ohem_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    thresh: float = 0.9,
    min_kept: int = 100000,
    class_weight: Optional[Sequence[float]] = None,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """FSOhemCELoss (loss_helper.py:215-261): online hard-example mining.

    Keeps pixels whose predicted prob of the true class is below
    ``max(thresh, prob of the min_kept-th hardest pixel)`` and takes the
    *unweighted* mean of their (class-weighted) CE values, exactly like the
    reference.  Static-shape formulation: the k-th order statistic is found
    with a full sort over the (masked) flat prob vector — no boolean
    compaction, so the whole loss stays inside one jit.
    """
    if logits.shape[1:3] != labels.shape[1:3]:
        labels = scale_target_nearest(labels, (logits.shape[1], logits.shape[2]))
    num_classes = logits.shape[-1]
    valid = (labels != ignore_index).reshape(-1)
    safe = jnp.clip(labels, 0, num_classes - 1)
    onehot = safe[..., None] == jnp.arange(num_classes, dtype=safe.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    p_true = jnp.sum(jnp.where(onehot, probs, 0.0), axis=-1).reshape(-1)
    # Invalid pixels -> prob 2.0: sorted last, never below any threshold <= 1.
    p_masked = jnp.where(valid, p_true, 2.0)
    sorted_p = jnp.sort(p_masked)
    n_valid = jnp.sum(valid)
    k = jnp.minimum(jnp.int32(min_kept), jnp.maximum(n_valid - 1, 0))
    min_threshold = sorted_p[k]
    threshold = jnp.maximum(min_threshold, thresh)

    wce, _, _ = _per_pixel_ce(
        logits, labels, class_weight, ignore_index
    )
    keep = valid & (p_masked < threshold)
    wce = wce.reshape(-1)
    return jnp.sum(jnp.where(keep, wce, 0.0)) / jnp.maximum(jnp.sum(keep), 1)


def upsampled_cross_entropy(
    seg: jnp.ndarray,  # [B, h, w, C] stride-level logits
    labels: jnp.ndarray,  # [B, H, W] full-res labels
    class_weight: Optional[Sequence[float]] = None,
    ignore_index: int = -1,
    row_block: int = 64,
    unroll: int = 4,
    precision: str = "highest",
) -> jnp.ndarray:
    """CE on align-corners-upsampled logits without materializing them.

    Equivalent to ``cross_entropy(resize_bilinear_align_corners(seg, (H, W)),
    labels)`` — the reference's ContrastCELoss path (loss_contrast.py:181) —
    but streamed over row blocks under jax.checkpoint, so the peak
    activation is [B, row_block, W, C] instead of [B, H, W, C] (the full
    upsampled Cityscapes logits are 160MB fp32 x several autodiff copies,
    enough to OOM a 16GB chip at batch 8).

    MXU layout: the block works in [B, C, rows, W] (channels OFF the
    minor axis).  With NHWC blocks the upsample einsums put C=19 on the
    128-lane axis (15% occupancy — measured 10.9 ms/step of the W48 step,
    ~4x its bandwidth bound); contracting with W/H minor keeps every
    matmul at full lane width and the softmax reduces over a major axis,
    which the VPU vectorizes over lanes.

    The NLL is ``logsumexp(up) - up[true]`` rather than a materialized
    ``log_softmax`` — identical values (both shift by the max), but the
    [B, C, r, W] log-prob tensor never hits HBM, only its C-reduced
    [B, r, W] marginals do.  ``unroll`` unrolls the row-block scan so XLA
    can overlap the per-block einsum chains instead of serializing eight
    dependent skinny matmuls behind one loop counter.

    ``precision`` sets the MXU passes for the interpolation einsums:
    "highest" (6-pass, exact fp32 — the default, matching the reference's
    fp32 F.interpolate) or "default" (single-pass bf16 multiplies with
    fp32 accumulation).  On TPU the train step opts into "default": the
    model computes ``seg`` in bf16 anyway, so rounding the interp taps to
    bf16 adds no new information loss, and the dense [H,h]/[W,w] bilinear
    matmuls (46 GFLOP at the headline shape) drop from 6 MXU passes to 1.
    On CPU every precision is exact fp32, so CPU parity tests see
    identical values either way.
    """
    import numpy as np

    from contrastiveseg_tpu.ops.resize import _align_corners_matrix

    B, h, w, C = seg.shape
    H, W = labels.shape[1], labels.shape[2]
    if (h, w) == (H, W):
        return cross_entropy(seg, labels, class_weight, ignore_index)
    nb = -(-H // row_block)
    Hp = nb * row_block
    a_h = _align_corners_matrix(H, h)  # [H, h]
    a_h = np.pad(a_h, ((0, Hp - H), (0, 0))).reshape(nb, row_block, h)
    a_w = jnp.asarray(_align_corners_matrix(W, w))
    labels_p = jnp.pad(
        labels, ((0, 0), (0, Hp - H), (0, 0)), constant_values=ignore_index
    ).reshape(B, nb, row_block, W).transpose(1, 0, 2, 3)

    hp = jax.lax.Precision(precision)
    seg_t = jnp.transpose(seg.astype(jnp.float32), (0, 3, 1, 2))  # [B,C,h,w]
    cw = (jnp.asarray(class_weight, jnp.float32)
          if class_weight is not None else None)
    c_iota = jnp.arange(C, dtype=labels.dtype)[None, :, None, None]

    @jax.checkpoint
    def block_loss(a_h_blk, lab_blk):
        up = jnp.einsum("rp,bcpq->bcrq", a_h_blk, seg_t, precision=hp)
        up = jnp.einsum("oq,bcrq->bcro", a_w, up, precision=hp)  # [B,C,r,W]
        valid = lab_blk != ignore_index
        safe = jnp.clip(lab_blk, 0, C - 1)
        onehot = safe[:, None, :, :] == c_iota
        # log_softmax(up)[true] == up[true] - logsumexp(up): same max-shift
        # arithmetic, but only the C-reduced marginals are materialized.
        true_logit = jnp.sum(jnp.where(onehot, up, 0.0), axis=1)
        nll = jax.nn.logsumexp(up, axis=1) - true_logit
        if cw is not None:
            wgt = jnp.sum(jnp.where(onehot, cw[None, :, None, None], 0.0),
                          axis=1)
        else:
            wgt = jnp.ones_like(nll)
        wgt = jnp.where(valid, wgt, 0.0)
        return jnp.sum(nll * wgt), jnp.sum(wgt)

    def body(carry, inp):
        num, den = carry
        a_h_blk, lab_blk = inp
        n, d = block_loss(a_h_blk, lab_blk)
        return (num + n, den + d), None

    (num, den), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
        (jnp.asarray(a_h), labels_p),
        unroll=max(1, min(unroll, nb)),
    )
    return num / jnp.maximum(den, 1e-12)


def aux_cross_entropy(
    seg_logits: jnp.ndarray,
    aux_logits: jnp.ndarray,
    labels: jnp.ndarray,
    seg_weight: float = 1.0,
    aux_weight: float = 0.4,
    class_weight: Optional[Sequence[float]] = None,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """FSAuxCELoss (loss_helper.py:301-313)."""
    return seg_weight * cross_entropy(
        seg_logits, labels, class_weight, ignore_index
    ) + aux_weight * cross_entropy(aux_logits, labels, class_weight, ignore_index)
