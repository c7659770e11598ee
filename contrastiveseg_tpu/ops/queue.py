"""Cross-image memory bank (pixel + segment queues) as pure functions.

The reference keeps the queues as module buffers mutated in the trainer
under no-grad (``_dequeue_and_enqueue``,
/root/reference/segmentor/trainer_contrastive.py:102-138) — per-rank
replicas that silently diverge across GPUs (SURVEY.md §2.9).  Here the bank
is part of the train state: the update is a pure ``(bank, keys, labels) ->
bank`` function inside the jitted train step, so under a device mesh every
chip sees one consistent global queue (the state is replicated or sharded by
the mesh, and XLA inserts the collectives).

Semantics kept per (image, class):
  * segment queue: mean embedding of the class's pixels, L2-normalized,
    written at ``ptr``; ptr advances by 1 (mod memory_size);
  * pixel queue: up to ``pixel_update_freq`` random pixels, L2-normalized.

Documented divergences:
  * pixel-queue ptr advances by the number of pixels written; the reference
    advances by 1 while writing K=10 rows (trainer_contrastive.py:131-138),
    so each step overwrites 9 of the previous step's entries — behavior we
    consider a bug;
  * wraparound is a clean ring (``(ptr + k) % size``) instead of the
    reference's tail-overwrite-and-reset;
  * class 0 participates by default (``include_class0``); the reference
    skips it and contrasts against stale random-init rows instead
    (loss_contrast_mem.py:99).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-12
_NEG_INF = -1e30


class MemoryBank(NamedTuple):
    segment_queue: jnp.ndarray  # [C, M, D]
    segment_ptr: jnp.ndarray  # [C] int32
    pixel_queue: jnp.ndarray  # [C, M, D]
    pixel_ptr: jnp.ndarray  # [C] int32


def _l2norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), _EPS)


def init_memory_bank(
    key: jax.Array, num_classes: int, memory_size: int, dim: int
) -> MemoryBank:
    """Random L2-normalized init (reference HRNet_W48_MEM, nets/hrnet.py:165-171)."""
    k1, k2 = jax.random.split(key)
    seg = _l2norm(jax.random.normal(k1, (num_classes, memory_size, dim)))
    pix = _l2norm(jax.random.normal(k2, (num_classes, memory_size, dim)))
    # Distinct buffers: the train step donates the whole state, and XLA
    # rejects donating one buffer twice.
    return MemoryBank(
        seg, jnp.zeros(num_classes, jnp.int32),
        pix, jnp.zeros(num_classes, jnp.int32),
    )


def enqueue(
    bank: MemoryBank,
    key: jax.Array,
    keys_feat: jnp.ndarray,  # [B, N, D] detached embeddings at queue stride
    labels: jnp.ndarray,  # [B, N] int32 labels at queue stride
    pixel_update_freq: int = 10,
    include_class0: bool = True,
    exact_sampling: bool = False,
) -> MemoryBank:
    """Enqueue the whole batch in one shot.

    The reference walks images sequentially because the ring pointers
    advance between them (trainer_contrastive.py:110); the same ordering is
    reproduced here in closed form — per-image ring rows are the exclusive
    cumulative sum of per-image write counts — so the heavy work (class
    masks, means, random pixel selection) is one batched einsum + one
    ``approx_max_k`` instead of a B-long sequential scan of 32k-element
    sorts (which cost >100ms/step on TPU).
    """
    C, M, D = bank.segment_queue.shape
    B, N, _ = keys_feat.shape
    K = pixel_update_freq
    cls = jnp.arange(C, dtype=labels.dtype)

    member = labels[:, None, :] == cls[None, :, None]  # [B, C, N]
    count = jnp.sum(member, axis=-1)  # [B, C]
    present = count > 0
    if not include_class0:
        present = present & (cls[None, :] > 0)

    # --- segment queue: per-(image, class) mean embedding, one einsum.
    mean = jnp.einsum(
        "bcn,bnd->bcd", member.astype(keys_feat.dtype), keys_feat,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(count[..., None], 1)
    mean = _l2norm(mean)  # [B, C, D]

    seg_offset = jnp.cumsum(present.astype(jnp.int32), axis=0) - present  # excl
    seg_rows = (bank.segment_ptr[None, :] + seg_offset) % M  # [B, C]
    # Ring-collision discipline: when a class writes more than M rows in one
    # batch, row (ptr+p)%M is finally owned by the LAST write with that
    # residue — exactly the writes at positions p >= total-M (each residue
    # occurs once per window of M consecutive positions).  Masking the rest
    # keeps the scatter free of duplicate indices (XLA .at[].set with
    # duplicates is order-UNDEFINED) and bit-matches sequential semantics.
    seg_total = jnp.sum(present, axis=0).astype(jnp.int32)  # [C]
    seg_live = present & (seg_offset >= (seg_total - M)[None, :])
    c_rows = jnp.broadcast_to(jnp.arange(C)[None, :], (B, C))
    # Dead writes are routed to a trash row (index M of an M+1 padded
    # queue, sliced off afterwards) so the scatter sees each LIVE row index
    # exactly once — never a live/dead index collision.
    seg_rows_w = jnp.where(seg_live, seg_rows, M)
    seg_q = (
        jnp.pad(bank.segment_queue, ((0, 0), (0, 1), (0, 0)))
        .at[c_rows, seg_rows_w]
        .set(mean.astype(bank.segment_queue.dtype))[:, :M]
    )
    seg_p = (bank.segment_ptr + jnp.sum(present, axis=0).astype(jnp.int32)) % M

    # --- pixel queue: up to K random member pixels per (image, class).
    scores = jnp.where(member, jax.random.uniform(key, member.shape), _NEG_INF)
    # approx_max_k: scores are iid uniform, so an approximate top-K is just
    # another uniform random subset — but it may return masked (-inf)
    # entries when a class has few, clustered pixels.  Validate against the
    # membership mask and compact valid-first so the ring write range stays
    # contiguous.
    # exact_sampling: layout-deterministic top_k (see ContrastSpec note).
    _top_k = jax.lax.top_k if exact_sampling else jax.lax.approx_max_k
    _, top_idx = _top_k(scores, K)  # [B, C, K]
    sel_ok = jnp.take_along_axis(member, top_idx, axis=2)  # [B, C, K]
    order = jnp.argsort(~sel_ok, axis=-1, stable=True)
    top_idx = jnp.take_along_axis(top_idx, order, axis=-1)
    vals = jnp.take_along_axis(
        keys_feat[:, None], top_idx[..., None], axis=2
    )  # [B, C, K, D]
    vals = _l2norm(vals)
    k_count = jnp.sum(sel_ok, axis=-1) * present  # [B, C]
    k_valid = jnp.arange(K)[None, None, :] < k_count[..., None]  # [B, C, K]
    pix_offset = jnp.cumsum(k_count, axis=0) - k_count  # exclusive
    starts = bank.pixel_ptr[None, :] + pix_offset  # [B, C]
    rows = (starts[..., None] + jnp.arange(K)[None, None, :]) % M  # [B, C, K]
    # Same ring-collision discipline as the segment queue: only the last M
    # write positions per class survive a wrapping batch; dead writes go to
    # the trash row so live indices never collide (scatter-order safety).
    pix_total = jnp.sum(k_count, axis=0).astype(jnp.int32)  # [C]
    flat_pos = pix_offset[..., None] + jnp.arange(K)[None, None, :]  # [B,C,K]
    k_live = k_valid & (flat_pos >= (pix_total - M)[None, :, None])
    rows_w = jnp.where(k_live, rows, M)
    c_rows3 = jnp.broadcast_to(jnp.arange(C)[None, :, None], (B, C, K))
    pix_q = (
        jnp.pad(bank.pixel_queue, ((0, 0), (0, 1), (0, 0)))
        .at[c_rows3, rows_w]
        .set(vals.astype(bank.pixel_queue.dtype))[:, :M]
    )
    pix_p = (bank.pixel_ptr + pix_total) % M

    return MemoryBank(seg_q, seg_p, pix_q, pix_p)


def bank_as_contrast_set(
    bank: MemoryBank, include_class0: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flatten (segment ++ pixel) queues to a [C*2M, D] contrast set.

    Mirrors ``queue = cat(segment_queue, pixel_queue, dim=1)``
    (loss_contrast_mem.py:216) followed by ``_sample_negative``.
    """
    C, M, D = bank.segment_queue.shape
    feats = jnp.concatenate(
        [bank.segment_queue, bank.pixel_queue], axis=1
    ).reshape(C * 2 * M, D)
    labels = jnp.repeat(jnp.arange(C, dtype=jnp.int32), 2 * M)
    valid = jnp.ones(C * 2 * M, dtype=bool)
    if not include_class0:
        valid = labels > 0
    return feats, labels, valid
