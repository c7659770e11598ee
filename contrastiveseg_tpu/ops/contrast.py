"""Pixel-contrast loss, redesigned static-shape for XLA.

The reference implementation (lib/loss/loss_contrast.py:15-147 and
loss_contrast_mem.py:15-171) builds the anchor set with *per-image per-class
Python loops* over dynamic ``nonzero`` index sets — unjittable and a
host-side serialization point.  This module reformulates the exact same
sampling distribution with static shapes:

  * every (image, class) pair is a *slot*; slot validity is
    ``count(label==c) > max_views`` exactly as the reference qualifies
    classes (loss_contrast.py:37-40);
  * ``n_view = min(max_samples // total_classes, max_views)`` is computed as
    a traced scalar; per-slot views beyond ``n_view`` are masked off;
  * the hard/easy split (gt==c & pred!=c vs gt==c & pred==c) and the
    reference's keep-count rules (loss_contrast.py:66-77) are evaluated as
    vectorized index arithmetic;
  * random sampling-without-replacement uses masked uniform scores +
    ``top_k`` (Gumbel-max is unnecessary for uniform permutation);
  * finally candidates are *compacted* to exactly ``max_samples`` rows
    (reference invariant: total anchors = total_classes * n_view <=
    max_samples), so the similarity matmul has a static
    ``[max_samples, max_samples + K]`` shape that compiles once and maps
    onto the MXU.

Documented divergences from the reference (all favorable):
  * no diag "self-exclusion" against the queue (the reference reuses the
    within-batch diagonal scatter against the queue matrix, dropping an
    arbitrary queue entry per row — loss_contrast_mem.py:137-142);
  * queue class 0 is included as a valid contrast class instead of the
    reference's skip-plus-stale-zero-rows artifact
    (loss_contrast_mem.py:91-105); rows with no positive are masked out
    instead of producing NaN.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class ContrastSpec(NamedTuple):
    num_classes: int
    max_samples: int = 1024
    max_views: int = 100
    temperature: float = 0.1
    base_temperature: float = 0.07
    ignore_label: int = -1
    # exact top_k instead of approx_max_k for anchor sampling.  approx_max_k
    # tiles its partial reduction over the physical layout, so its recall
    # set can change when the batch axis is sharded differently — fine for
    # training (any recalled subset of iid-uniform scores is still uniform)
    # but it breaks mesh-vs-solo equivalence checks.  `contrast.
    # exact_sampling` turns on the layout-deterministic sort-based path.
    exact_sampling: bool = False


class AnchorSet(NamedTuple):
    feats: jnp.ndarray  # [M, D]  M = max_samples
    labels: jnp.ndarray  # [M] int32
    valid: jnp.ndarray  # [M] bool


_NEG_INF = -1e30


def hard_anchor_sample(
    key: jax.Array,
    embed: jnp.ndarray,  # [B, N, D] L2-normalized pixel embeddings
    labels: jnp.ndarray,  # [B, N] int32 ground truth (ignore = spec.ignore_label)
    predict: jnp.ndarray,  # [B, N] int32 argmax predictions
    spec: ContrastSpec,
) -> AnchorSet:
    """Vectorized equivalent of ``_hard_anchor_sampling`` (loss_contrast.py:30-89)."""
    B, N, D = embed.shape
    C, V, M = spec.num_classes, spec.max_views, spec.max_samples

    cls = jnp.arange(C, dtype=labels.dtype)
    member = labels[:, None, :] == cls[None, :, None]  # [B, C, N]
    count = jnp.sum(member, axis=-1)  # [B, C]
    slot_valid = count > V  # reference: strictly greater (loss_contrast.py:40)

    total_classes = jnp.maximum(jnp.sum(slot_valid), 1)
    # Traced scalar.  Clamped to >=1: the reference hits n_view=0 (and then
    # NaNs on empty anchors) when total_classes > max_samples; we keep one
    # view per slot and let the M-row compaction truncate the excess.
    n_view = jnp.clip(M // total_classes, 1, V)

    pred_is_c = predict[:, None, :] == cls[None, :, None]
    hard_mask = member & ~pred_is_c
    easy_mask = member & pred_is_c

    # Sample-without-replacement: rank member pixels by uniform scores.
    # approx_max_k (TPU-native partial reduction) instead of the sort-based
    # exact top_k (~10ms/step); with iid uniform scores any recalled subset
    # is still a uniform random subset.  It can return masked entries when
    # a pool is small and clustered, so selections are revalidated against
    # the masks, compacted valid-first, and the pool sizes capped by the
    # actually-recalled counts before the keep rules run.
    khard, keasy = jax.random.split(key)
    sh = jnp.where(hard_mask, jax.random.uniform(khard, (B, C, N)), _NEG_INF)
    se = jnp.where(easy_mask, jax.random.uniform(keasy, (B, C, N)), _NEG_INF)
    top_k = jax.lax.top_k if spec.exact_sampling else jax.lax.approx_max_k
    _, hard_idx = top_k(sh, V)  # [B, C, V] pixel indices
    _, easy_idx = top_k(se, V)

    def _revalidate(idx, mask):
        sel_ok = jnp.take_along_axis(mask, idx, axis=-1)
        order = jnp.argsort(~sel_ok, axis=-1, stable=True)
        return (
            jnp.take_along_axis(idx, order, axis=-1),
            jnp.sum(sel_ok, axis=-1),
        )

    hard_idx, num_hard = _revalidate(hard_idx, hard_mask)
    easy_idx, num_easy = _revalidate(easy_idx, easy_mask)

    # Keep-count rules (loss_contrast.py:66-77).  Slot qualification
    # guarantees num_hard + num_easy = count > max_views >= n_view, so the
    # reference's unreachable else-branch stays unreachable (up to
    # approximate-recall slack, handled by the final clip).
    half = n_view // 2
    both = (2 * num_hard >= n_view) & (2 * num_easy >= n_view)
    hard_rich = 2 * num_hard >= n_view
    num_hard_keep = jnp.where(
        both, half, jnp.where(hard_rich, n_view - num_easy, num_hard)
    )
    num_hard_keep = jnp.clip(num_hard_keep, 0, jnp.minimum(n_view, num_hard))

    # view v takes hard_idx[v] while v < num_hard_keep, else easy pool.
    v_ids = jnp.arange(V)
    use_hard = v_ids[None, None, :] < num_hard_keep[..., None]  # [B, C, V]
    easy_pos = jnp.clip(v_ids[None, None, :] - num_hard_keep[..., None], 0, V - 1)
    easy_take = jnp.take_along_axis(easy_idx, easy_pos, axis=-1)
    pix_idx = jnp.where(use_hard, hard_idx, easy_take)  # [B, C, V]

    # A view is valid if within n_view AND covered by the recalled pools
    # (approx_max_k may under-recall tiny clustered pools).
    supply = num_hard_keep + num_easy
    view_valid = (
        (v_ids[None, None, :] < n_view)
        & (v_ids[None, None, :] < supply[..., None])
        & slot_valid[..., None]
    )

    # Global flat pixel index per candidate, view-major like the reference's
    # unbind/cat ordering (irrelevant to the value, kept for testability).
    b_ids = jnp.arange(B)[:, None, None]
    flat_idx = (b_ids * N + pix_idx).transpose(2, 0, 1).reshape(-1)  # [V*B*C]
    flat_valid = view_valid.transpose(2, 0, 1).reshape(-1)
    flat_label = jnp.broadcast_to(cls[None, :, None], (B, C, V)).transpose(
        2, 0, 1
    ).reshape(-1)

    # Compact to exactly M rows.  total_valid <= M by construction.
    order = jnp.argsort(~flat_valid, stable=True)[:M]
    sel_valid = jnp.take(flat_valid, order)
    sel_idx = jnp.take(flat_idx, order)
    sel_label = jnp.take(flat_label, order).astype(jnp.int32)

    feats = jnp.take(embed.reshape(B * N, D), sel_idx, axis=0)
    feats = jnp.where(sel_valid[:, None], feats, 0.0)
    return AnchorSet(feats=feats, labels=sel_label, valid=sel_valid)


def contrastive_loss(
    anchors: AnchorSet,
    spec: ContrastSpec,
    queue_feats: Optional[jnp.ndarray] = None,  # [K, D]
    queue_labels: Optional[jnp.ndarray] = None,  # [K]
    queue_valid: Optional[jnp.ndarray] = None,  # [K] bool
) -> jnp.ndarray:
    """Masked InfoNCE matching ``_contrastive`` (loss_contrast.py:91-128).

    Per anchor row i:  log_prob_ij = logits_ij - log(exp(logits_ij) +
    sum_neg exp(logits_in));  loss_i = -(t/bt) * mean_j in pos log_prob_ij;
    final = mean over valid rows with >=1 positive.
    """
    a_f, a_l, a_v = anchors
    if queue_feats is None:
        c_f, c_l, c_v = a_f, a_l, a_v
        self_exclude = True
    else:
        c_f = queue_feats
        c_l = queue_labels.astype(jnp.int32)
        c_v = (
            queue_valid
            if queue_valid is not None
            else jnp.ones(c_f.shape[0], dtype=bool)
        )
        self_exclude = False

    # Full-fp32 similarity: default matmul precision truncates operands to
    # bf16, which moves the InfoNCE value by ~1e-3 — enough to break parity
    # tests and subtly change hard-negative ordering.
    logits = (
        jnp.dot(
            a_f.astype(jnp.float32),
            c_f.astype(jnp.float32).T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        / spec.temperature
    )  # [M, Kc]

    same = a_l[:, None] == c_l[None, :]
    col_ok = c_v[None, :]
    pos_mask = same & col_ok
    neg_mask = (~same) & col_ok
    if self_exclude:
        eye = jnp.eye(logits.shape[0], dtype=bool)
        pos_mask = pos_mask & ~eye
        neg_mask = neg_mask & ~eye

    # Stability shift: masked row max (detached by construction — the shift
    # cancels exactly in the log-ratio).
    masked = jnp.where(col_ok, logits, _NEG_INF)
    row_max = jax.lax.stop_gradient(jnp.max(masked, axis=1, keepdims=True))
    shifted = logits - row_max

    exp_shifted = jnp.where(col_ok, jnp.exp(shifted), 0.0)
    neg_sum = jnp.sum(jnp.where(neg_mask, exp_shifted, 0.0), axis=1, keepdims=True)
    log_prob = shifted - jnp.log(exp_shifted + neg_sum + 1e-30)

    pos_cnt = jnp.sum(pos_mask, axis=1)
    mean_log_prob_pos = jnp.sum(
        jnp.where(pos_mask, log_prob, 0.0), axis=1
    ) / jnp.maximum(pos_cnt, 1)

    row_ok = a_v & (pos_cnt > 0)
    per_row = -(spec.temperature / spec.base_temperature) * mean_log_prob_pos
    return jnp.sum(jnp.where(row_ok, per_row, 0.0)) / jnp.maximum(
        jnp.sum(row_ok), 1
    )


def pixel_contrast_loss(
    key: jax.Array,
    embed: jnp.ndarray,  # [B, H, W, D] NHWC normalized embeddings
    labels: jnp.ndarray,  # [B, Hl, Wl] full-res ground truth
    predict: jnp.ndarray,  # [B, H, W] argmax of stride-level logits
    spec: ContrastSpec,
    queue_feats: Optional[jnp.ndarray] = None,
    queue_labels: Optional[jnp.ndarray] = None,
    queue_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """End-to-end: label downscale -> sample -> InfoNCE.

    Mirrors ``PixelContrastLoss.forward`` (loss_contrast.py:130-147): labels
    are nearest-downscaled to the embedding grid first.
    """
    from contrastiveseg_tpu.ops.resize import scale_target_nearest

    B, H, W, D = embed.shape
    labels_s = scale_target_nearest(labels, (H, W)).reshape(B, H * W)
    predict_s = predict.reshape(B, H * W)
    anchors = hard_anchor_sample(
        key, embed.reshape(B, H * W, D), labels_s, predict_s, spec
    )
    return contrastive_loss(
        anchors, spec, queue_feats, queue_labels, queue_valid
    )
