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
) -> MemoryBank:
    """Sequentially enqueue each image of the batch (order matters for ptrs)."""
    C, M, D = bank.segment_queue.shape
    K = pixel_update_freq
    cls = jnp.arange(C, dtype=labels.dtype)
    c_idx = jnp.arange(C)

    def per_image(carry: MemoryBank, inp) -> tuple[MemoryBank, None]:
        seg_q, seg_p, pix_q, pix_p = carry
        feats, lab, k = inp  # [N, D], [N], rng
        member = lab[None, :] == cls[:, None]  # [C, N]
        count = jnp.sum(member, axis=-1)  # [C]
        present = count > 0
        if not include_class0:
            present = present & (c_idx > 0)

        # --- segment queue: class-mean embedding.
        mean = jnp.dot(
            member.astype(feats.dtype), feats,
            precision=jax.lax.Precision.HIGHEST,
        ) / jnp.maximum(count[:, None], 1).astype(feats.dtype)
        mean = _l2norm(mean)
        row = seg_p % M
        old = seg_q[c_idx, row]
        seg_q = seg_q.at[c_idx, row].set(
            jnp.where(present[:, None], mean, old)
        )
        seg_p = (seg_p + present.astype(jnp.int32)) % M

        # --- pixel queue: up to K random member pixels.
        scores = jnp.where(
            member, jax.random.uniform(k, member.shape), _NEG_INF
        )
        _, top_idx = jax.lax.top_k(scores, K)  # [C, K]
        vals = _l2norm(jnp.take(feats, top_idx.reshape(-1), axis=0)).reshape(
            C, K, D
        )
        k_valid = (
            jnp.arange(K)[None, :] < jnp.minimum(count, K)[:, None]
        ) & present[:, None]  # [C, K]
        rows = (pix_p[:, None] + jnp.arange(K)[None, :]) % M  # [C, K]
        old_vals = pix_q[c_idx[:, None], rows]
        pix_q = pix_q.at[c_idx[:, None], rows].set(
            jnp.where(k_valid[..., None], vals, old_vals)
        )
        pix_p = (pix_p + jnp.sum(k_valid, axis=-1).astype(jnp.int32)) % M
        return MemoryBank(seg_q, seg_p, pix_q, pix_p), None

    B = keys_feat.shape[0]
    keys_rng = jax.random.split(key, B)
    bank, _ = jax.lax.scan(per_image, bank, (keys_feat, labels, keys_rng))
    return bank


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
