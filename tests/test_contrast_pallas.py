"""Pallas fused InfoNCE == streaming/dense jnp paths (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveseg_tpu.ops.contrast import (
    AnchorSet,
    ContrastSpec,
    contrastive_loss,
)
from contrastiveseg_tpu.ops.contrast_pallas import pallas_contrastive_loss
from contrastiveseg_tpu.ops.contrast_stream import streaming_contrastive_loss


def _setup(M=16, K=48, D=8, C=5, seed=0):
    rng = np.random.default_rng(seed)
    a_f = rng.standard_normal((M, D)).astype(np.float32)
    a_f /= np.linalg.norm(a_f, axis=-1, keepdims=True)
    a_l = rng.integers(0, C, size=M).astype(np.int32)
    a_v = rng.random(M) < 0.9
    c_f = rng.standard_normal((K, D)).astype(np.float32)
    c_f /= np.linalg.norm(c_f, axis=-1, keepdims=True)
    c_l = rng.integers(0, C, size=K).astype(np.int32)
    c_v = rng.random(K) < 0.9
    return map(jnp.asarray, (a_f, a_l, a_v, c_f, c_l, c_v))


def test_pallas_value_matches_dense():
    a_f, a_l, a_v, c_f, c_l, c_v = _setup()
    spec = ContrastSpec(num_classes=5, max_samples=16, max_views=4,
                        temperature=0.07, base_temperature=0.07)
    dense = float(contrastive_loss(AnchorSet(a_f, a_l, a_v), spec,
                                   c_f, c_l, c_v))
    for bk in (16, 32, 64):
        pallas = float(pallas_contrastive_loss(
            a_f, a_l, a_v, c_f, c_l, c_v, 0.07, 0.07, bk
        ))
        assert abs(dense - pallas) < 1e-5, (bk, dense, pallas)


def test_pallas_grad_matches_stream():
    a_f, a_l, a_v, c_f, c_l, c_v = _setup(seed=2)

    def f_pallas(x):
        return pallas_contrastive_loss(x, a_l, a_v, c_f, c_l, c_v,
                                       0.1, 0.07, 16)

    def f_stream(x):
        return streaming_contrastive_loss(x, a_l, a_v, c_f, c_l, c_v,
                                          0.1, 0.07, 16)

    gp = np.asarray(jax.grad(f_pallas)(a_f))
    gs = np.asarray(jax.grad(f_stream)(a_f))
    np.testing.assert_allclose(gp, gs, atol=1e-5, rtol=1e-4)
