"""Streamed upsample+CE == materialized upsample+CE (value and grad)."""

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveseg_tpu.losses.ce import cross_entropy, upsampled_cross_entropy
from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners

W19 = tuple(0.8 + 0.02 * i for i in range(5))


def test_value_and_grad_match():
    rng = np.random.default_rng(0)
    B, h, w, C = 2, 8, 12, 5
    H, W = 31, 45  # non-multiple sizes
    seg = jnp.asarray(rng.standard_normal((B, h, w, C), dtype=np.float32))
    labels = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
    labels[rng.random((B, H, W)) < 0.2] = -1
    labels = jnp.asarray(labels)

    def dense(s):
        return cross_entropy(
            resize_bilinear_align_corners(s, (H, W)), labels, W19
        )

    def streamed(s):
        return upsampled_cross_entropy(s, labels, W19, row_block=7)

    vd, gd = jax.value_and_grad(dense)(seg)
    vs, gs = jax.value_and_grad(streamed)(seg)
    assert abs(float(vd) - float(vs)) < 1e-5, (vd, vs)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gs),
                               atol=1e-5, rtol=1e-4)


def test_default_precision_exact_on_cpu():
    """precision='default' only relaxes MXU passes on TPU; on CPU every
    precision computes exact fp32, so values and grads are identical.
    (On TPU 'default' is the train-step fast path: 5.0 -> 1.1 ms/call at
    the headline shape, BENCH_NOTES_r05.md.)"""
    rng = np.random.default_rng(1)
    B, h, w, C = 2, 8, 12, 5
    H, W = 31, 45
    seg = jnp.asarray(rng.standard_normal((B, h, w, C), dtype=np.float32))
    labels = jnp.asarray(rng.integers(-1, C, size=(B, H, W)).astype(np.int32))

    def f(prec):
        return jax.value_and_grad(
            lambda s: upsampled_cross_entropy(
                s, labels, W19, row_block=7, precision=prec))(seg)

    v_hi, g_hi = f("highest")
    v_def, g_def = f("default")
    assert float(v_hi) == float(v_def)
    np.testing.assert_array_equal(np.asarray(g_hi), np.asarray(g_def))
