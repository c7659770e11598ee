"""Criss-cross attention and deformable conv (native-extension equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveseg_tpu.ops.cc_attention import criss_cross_attention
from contrastiveseg_tpu.ops.deform_conv import deform_conv2d


def test_cc_attention_matches_naive():
    rng = np.random.default_rng(0)
    B, H, W, Dk, Dv = 1, 5, 7, 4, 6
    q = rng.standard_normal((B, H, W, Dk)).astype(np.float32)
    k = rng.standard_normal((B, H, W, Dk)).astype(np.float32)
    v = rng.standard_normal((B, H, W, Dv)).astype(np.float32)

    out = np.asarray(criss_cross_attention(*map(jnp.asarray, (q, k, v))))

    # Naive per-pixel criss-cross softmax.
    for y in range(H):
        for x in range(W):
            logits, vals = [], []
            for yy in range(H):
                if yy == y:
                    continue  # self belongs to the row pass
                logits.append(q[0, y, x] @ k[0, yy, x])
                vals.append(v[0, yy, x])
            for xx in range(W):
                logits.append(q[0, y, x] @ k[0, y, xx])
                vals.append(v[0, y, xx])
            w = np.exp(logits - np.max(logits))
            w /= w.sum()
            expect = (np.asarray(vals) * w[:, None]).sum(0)
            np.testing.assert_allclose(out[0, y, x], expect, atol=1e-4)


def test_deform_conv_zero_offset_equals_conv():
    rng = np.random.default_rng(1)
    B, H, W, Cin, Cout, k = 1, 8, 10, 3, 5, 3
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    w = rng.standard_normal((k, k, Cin, Cout)).astype(np.float32)
    offsets = np.zeros((B, H, W, 2 * k * k), np.float32)

    out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets),
                                   jnp.asarray(w)))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-4)


def test_deform_conv_offset_shifts_samples():
    rng = np.random.default_rng(2)
    B, H, W, Cin, Cout, k = 1, 8, 8, 2, 2, 1
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    w = np.eye(2)[None, None].astype(np.float32)  # identity 1x1 kernel
    # offset (dy=1, dx=0): output (y) should equal x at (y+1).
    offsets = np.zeros((B, H, W, 2), np.float32)
    offsets[..., 0] = 1.0
    out = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets),
                                   jnp.asarray(w)))
    np.testing.assert_allclose(out[0, :-1], x[0, 1:], atol=1e-5)
    np.testing.assert_allclose(out[0, -1], 0.0, atol=1e-6)  # outside -> 0

    # Gradients flow to offsets (the point of DCN).
    g = jax.grad(
        lambda o: jnp.sum(deform_conv2d(jnp.asarray(x), o, jnp.asarray(w)))
    )(jnp.asarray(offsets + 0.3))
    assert np.abs(np.asarray(g)).sum() > 0
