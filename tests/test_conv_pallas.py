"""Pallas small-channel 3x3 conv: forward + gradient equivalence vs
lax.conv_general_dilated (the SURVEY.md §4(b) dual-implementation
pattern), plus the ConvBN/BasicBlock integration path.

On CPU the kernel runs in interpreter mode; the same code compiles via
Mosaic on TPU (microbenchmarked at 70 TF/s vs XLA's 35 TF/s for the
C=48 HRNet branch convs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastiveseg_tpu.ops.conv_pallas import (
    conv3x3, pick_block_h, supported)

RNG = np.random.default_rng(0)


def _ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape", [
    (2, 16, 24, 12, 12),   # generic small
    (1, 8, 16, 18, 18),    # hrnet18 branch0 block
    (1, 32, 16, 48, 48),   # hrnet48-like channels
    (1, 8, 16, 3, 18),     # non-square channel counts
])
def test_forward_matches_xla(shape):
    b, h, w_, c, co = shape
    x = jnp.asarray(RNG.standard_normal((b, h, w_, c)).astype(np.float32))
    w = jnp.asarray(
        (RNG.standard_normal((3, 3, c, co)) * 0.1).astype(np.float32))
    out = conv3x3(x, w, True)
    np.testing.assert_allclose(out, _ref(x, w), atol=1e-4, rtol=1e-4)


def test_gradients_match_xla():
    b, h, w_, c, co = 2, 16, 24, 12, 12
    x = jnp.asarray(RNG.standard_normal((b, h, w_, c)).astype(np.float32))
    w = jnp.asarray(
        (RNG.standard_normal((3, 3, c, co)) * 0.1).astype(np.float32))
    tgt = jnp.asarray(
        RNG.standard_normal((b, h, w_, co)).astype(np.float32))

    def loss_p(x, w):
        return ((conv3x3(x, w, True) - tgt) ** 2).sum()

    def loss_r(x, w):
        return ((_ref(x, w) - tgt) ** 2).sum()

    gx_p, gw_p = jax.grad(loss_p, (0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_r, (0, 1))(x, w)
    np.testing.assert_allclose(gx_p, gx_r, atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(gw_p, gw_r, atol=1e-3, rtol=1e-4)


def test_supported_predicate():
    assert supported((1, 32, 256, 48), 3, 1, 1)
    assert not supported((1, 32, 256, 48), 1, 1, 1)   # 1x1
    assert not supported((1, 32, 256, 48), 3, 2, 1)   # strided
    assert not supported((1, 32, 256, 48), 3, 1, 2)   # dilated
    assert not supported((1, 32, 256, 720), 3, 1, 1)  # wide channels
    assert not supported((1, 6, 256, 48), 3, 1, 1)    # H not 8-aligned
    assert pick_block_h(128) == 32 and pick_block_h(8) == 8
    assert pick_block_h(12) == 0


def test_basicblock_path_equivalent():
    """Same params through the XLA and Pallas paths of BasicBlock —
    the pallas=True flag must be a pure performance knob."""
    from contrastiveseg_tpu.models.layers import BasicBlock

    x = jax.random.normal(jax.random.key(0), (2, 8, 16, 18), jnp.float32)
    b0 = BasicBlock(18)
    b1 = BasicBlock(18, pallas=True)
    v = b0.init({"params": jax.random.key(1)}, x, train=False)
    a = b0.apply(v, x, train=False)
    b = b1.apply(v, x, train=False)
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
    # Param trees are structurally identical (checkpoint compatibility).
    assert jax.tree_util.tree_structure(
        v["params"]
    ) == jax.tree_util.tree_structure(
        b1.init({"params": jax.random.key(1)}, x, train=False)["params"]
    )


def test_hrnet_pallas_flag_trains():
    """One value-and-grad step through a pallas_conv HRNet matches the
    XLA path on identical params (train mode, normalized activations)."""
    from contrastiveseg_tpu.models.hrnet import HRNET_SPECS, HRNet

    x = jax.random.normal(jax.random.key(0), (1, 16, 32, 3), jnp.float32)
    m0 = HRNet(HRNET_SPECS["hrnet18"])
    m1 = HRNet(HRNET_SPECS["hrnet18"], pallas_conv=True)
    v = m0.init({"params": jax.random.key(1)}, x, train=True)

    def loss(model, params):
        feats, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return sum((f ** 2).mean() for f in feats)

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(v["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(v["params"])
    assert np.isclose(float(l0), float(l1), rtol=1e-4)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=2e-3)


def test_fused_basic_block_eval_matches_xla():
    """ops/block_pallas.py: the fused two-conv BasicBlock kernel (eval
    BN folded) matches the XLA formulation — incl. the subtle boundary
    semantics (conv2's SAME padding must see ZEROS outside the image,
    not conv1 evaluated on padding) exercised by the first/last row
    blocks and unaligned width."""
    from contrastiveseg_tpu.ops.block_pallas import (
        fold_bn,
        fused_basic_block_eval,
        reference_block_eval,
    )

    rng = np.random.default_rng(0)
    B, H, W, C = 2, 32, 40, 48
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    w1 = jnp.asarray(
        rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(
        rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1)

    def mk():
        return fold_bn(
            jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32)),
            jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1),
            jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.2),
            jnp.asarray(rng.uniform(0.5, 2.0, C).astype(np.float32)))

    s1, b1 = mk()
    s2, b2 = mk()
    ref = reference_block_eval(x, w1, s1, b1, w2, s2, b2)
    got = fused_basic_block_eval(x, w1, s1, b1, w2, s2, b2,
                                 block_h=16, sub_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=0)

    # bf16 path (the production dtype) stays within bf16 resolution.
    got16 = fused_basic_block_eval(
        x.astype(jnp.bfloat16), w1, s1, b1, w2, s2, b2,
        block_h=16, sub_h=8, interpret=True)
    err = np.abs(np.asarray(got16, np.float32) - np.asarray(ref)).max()
    assert err < 0.35, err  # ~21 activation scale * bf16 eps * depth
