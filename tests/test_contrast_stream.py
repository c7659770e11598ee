"""Streaming loss == dense loss (value and anchor gradient)."""

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveseg_tpu.ops.contrast import (
    AnchorSet,
    ContrastSpec,
    contrastive_loss,
)
from contrastiveseg_tpu.ops.contrast_stream import streaming_contrastive_loss


def _setup(M=24, K=100, D=16, C=6, seed=0):
    rng = np.random.default_rng(seed)
    a_f = rng.standard_normal((M, D)).astype(np.float32)
    a_f /= np.linalg.norm(a_f, axis=-1, keepdims=True)
    a_l = rng.integers(0, C, size=M).astype(np.int32)
    a_v = rng.random(M) < 0.85
    c_f = rng.standard_normal((K, D)).astype(np.float32)
    c_f /= np.linalg.norm(c_f, axis=-1, keepdims=True)
    c_l = rng.integers(0, C, size=K).astype(np.int32)
    c_v = rng.random(K) < 0.9
    return map(jnp.asarray, (a_f, a_l, a_v, c_f, c_l, c_v))


def test_value_matches_dense():
    a_f, a_l, a_v, c_f, c_l, c_v = _setup()
    spec = ContrastSpec(num_classes=6, max_samples=24, max_views=4,
                        temperature=0.07, base_temperature=0.07)
    dense = contrastive_loss(AnchorSet(a_f, a_l, a_v), spec, c_f, c_l, c_v)
    for chunk in (16, 37, 100, 256):
        stream = streaming_contrastive_loss(
            a_f, a_l, a_v, c_f, c_l, c_v, 0.07, 0.07, chunk
        )
        assert abs(float(dense) - float(stream)) < 1e-5, (chunk, dense, stream)


def test_grad_matches_dense():
    a_f, a_l, a_v, c_f, c_l, c_v = _setup(seed=3)
    spec = ContrastSpec(num_classes=6, max_samples=24, max_views=4,
                        temperature=0.1, base_temperature=0.07)

    def dense_fn(x):
        return contrastive_loss(AnchorSet(x, a_l, a_v), spec, c_f, c_l, c_v)

    def stream_fn(x):
        return streaming_contrastive_loss(
            x, a_l, a_v, c_f, c_l, c_v, 0.1, 0.07, 32
        )

    gd = jax.grad(dense_fn)(a_f)
    gs = jax.grad(stream_fn)(a_f)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gs),
                               atol=2e-6, rtol=1e-4)


def test_grad_matches_finite_difference():
    a_f, a_l, a_v, c_f, c_l, c_v = _setup(M=8, K=40, seed=5)

    def f(x):
        return streaming_contrastive_loss(
            x, a_l, a_v, c_f, c_l, c_v, 0.1, 0.07, 16
        )

    g = np.asarray(jax.grad(f)(a_f))
    rng = np.random.default_rng(0)
    for _ in range(3):
        i, j = rng.integers(0, a_f.shape[0]), rng.integers(0, a_f.shape[1])
        eps = 1e-3
        xp = a_f.at[i, j].add(eps)
        xm = a_f.at[i, j].add(-eps)
        fd = (float(f(xp)) - float(f(xm))) / (2 * eps)
        assert abs(fd - g[i, j]) < 5e-3, (i, j, fd, g[i, j])
