"""Memory bank: vectorized enqueue semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveseg_tpu.ops.queue import (
    bank_as_contrast_set,
    enqueue,
    init_memory_bank,
)


def _norm(x, axis=-1):
    return x / np.linalg.norm(x, axis=axis, keepdims=True)


def _setup(B=3, N=64, C=4, D=8, M=16, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((B, N, D)).astype(np.float32)
    labels = rng.integers(0, C, size=(B, N)).astype(np.int32)
    bank = init_memory_bank(jax.random.key(1), C, M, D)
    return bank, jnp.asarray(feats), jnp.asarray(labels), feats, labels


def test_segment_queue_holds_class_means():
    bank, feats_j, labels_j, feats, labels = _setup()
    B, N, D = feats.shape
    C, M, _ = bank.segment_queue.shape
    out = enqueue(bank, jax.random.key(2), feats_j, labels_j,
                  pixel_update_freq=5)
    seg = np.asarray(out.segment_queue)
    # Image b writes class c at row (0 + #presences before b) — labels are
    # dense so every class is present in every image here.
    for c in range(C):
        for b in range(B):
            expect = _norm(feats[b][labels[b] == c].mean(axis=0))
            np.testing.assert_allclose(seg[c, b], expect, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.segment_ptr), [B] * C)


def test_pixel_queue_rows_are_member_pixels():
    bank, feats_j, labels_j, feats, labels = _setup(seed=3)
    B, N, D = feats.shape
    C, M, _ = bank.segment_queue.shape
    K = 5
    out = enqueue(bank, jax.random.key(4), feats_j, labels_j,
                  pixel_update_freq=K)
    pix = np.asarray(out.pixel_queue)
    ptr = np.asarray(out.pixel_ptr)
    for c in range(C):
        total = ptr[c]
        assert total == sum(min((labels[b] == c).sum(), K) for b in range(B))
        # Every written row must be the normalization of some class-c pixel.
        pool = _norm(np.concatenate([feats[b][labels[b] == c] for b in range(B)]))
        for r in range(total):
            d = np.linalg.norm(pool - pix[c, r], axis=1).min()
            assert d < 1e-5, (c, r, d)


def test_ring_wraparound():
    bank, feats_j, labels_j, *_ = _setup(M=4)
    out = bank
    for i in range(3):
        out = enqueue(out, jax.random.key(10 + i), feats_j, labels_j,
                      pixel_update_freq=3)
    assert np.all(np.asarray(out.segment_ptr) == (3 * 3) % 4)
    assert np.asarray(out.pixel_ptr).max() < 4


def test_contrast_set_layout():
    bank, *_ = _setup()
    f, l, v = bank_as_contrast_set(bank)
    C, M, D = bank.segment_queue.shape
    assert f.shape == (C * 2 * M, D)
    assert np.array_equal(
        np.asarray(l[:2 * M]), np.zeros(2 * M)
    )
    f2, l2, v2 = bank_as_contrast_set(bank, include_class0=False)
    assert not v2[:2 * M].any() and v2[2 * M:].all()
