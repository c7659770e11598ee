"""PAC ops vs a direct torch port of the reference native implementation
(pac.py:398-477 packernel2d/pacconv2d native_impl; the reference file
itself imports the long-removed torch._thnn, so the oracle is re-stated
here — the pacnet-style dual-implementation pattern, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from contrastiveseg_tpu.ops.pac import (
    PacCRF,
    PacConv2d,
    extract_patches,
    packernel2d,
    pacconv2d,
    pacpool2d,
)


def _torch_packernel(guide, k, dilation=1, normalize=False):
    """packernel2d native_impl, kernel_type='gaussian', stride 1."""
    pad = dilation * (k - 1) // 2
    bs, ch, H, W = guide.shape
    x = F.unfold(guide, k, dilation, pad, 1).view(bs, ch, k * k, H, W)
    feat_0 = x[:, :, k * k // 2:k * k // 2 + 1]
    x = (x - feat_0) ** 2
    x = torch.sum(x, dim=1, keepdim=True)
    x = torch.exp(-0.5 * x)
    if normalize:
        x = x / x.sum(dim=2, keepdim=True).clamp(min=1e-12)
    return x[:, 0]  # [B, k*k, H, W]


def _torch_pacconv(inp, kernel, weight):
    """pacconv2d native_impl (pac.py:462-473), stride 1."""
    k = weight.shape[-1]
    pad = (k - 1) // 2
    bs, ch, H, W = inp.shape
    cols = F.unfold(inp, k, 1, pad, 1).view(bs, ch, k, k, H, W)
    kern = kernel.view(bs, 1, k, k, H, W)
    return torch.einsum("ijklmn,ojkl->iomn", cols * kern, weight)


def test_extract_patches_center_identity():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 6, 7, 3)).astype(np.float32)
    p = np.asarray(extract_patches(jnp.asarray(x), 3))
    np.testing.assert_array_equal(p[:, :, :, 4, :], x)  # center tap
    # Top-left tap of pixel (1,1) is pixel (0,0).
    np.testing.assert_array_equal(p[0, 1, 1, 0], x[0, 0, 0])


def test_packernel_matches_torch():
    rng = np.random.default_rng(1)
    g = rng.standard_normal((2, 5, 8, 9)).astype(np.float32)  # NCHW
    for normalize in (False, True):
        ref = _torch_packernel(torch.from_numpy(g), 3,
                               normalize=normalize).numpy()
        ours = np.asarray(packernel2d(
            jnp.asarray(np.transpose(g, (0, 2, 3, 1))), 3,
            normalize_kernel=normalize))
        ours_nchw = np.transpose(ours, (0, 3, 1, 2))
        np.testing.assert_allclose(ours_nchw, ref, atol=1e-5)


def test_pacconv_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 8, 9)).astype(np.float32)  # NCHW
    g = rng.standard_normal((2, 3, 8, 9)).astype(np.float32)
    w = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)  # OIHW

    kern_t = _torch_packernel(torch.from_numpy(g), 3)
    ref = _torch_pacconv(torch.from_numpy(x), kern_t,
                         torch.from_numpy(w)).numpy()

    xn = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    gn = jnp.asarray(np.transpose(g, (0, 2, 3, 1)))
    wn = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    kern = packernel2d(gn, 3)
    out = np.asarray(pacconv2d(xn, kern, wn))
    np.testing.assert_allclose(
        np.transpose(out, (0, 3, 1, 2)), ref, atol=1e-4)


def test_pacconv_gradients_flow():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 2)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((1, 6, 6, 2)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 2, 4)).astype(np.float32))

    def loss(x_, g_, w_):
        return jnp.sum(pacconv2d(x_, packernel2d(g_, 3), w_) ** 2)

    gx, gg, gw = jax.grad(loss, argnums=(0, 1, 2))(x, g, w)
    for grad in (gx, gg, gw):
        assert np.isfinite(np.asarray(grad)).all()
        assert float(jnp.abs(grad).sum()) > 0


def test_pac_modules():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    m = PacConv2d(5)
    v = m.init(jax.random.key(0), x, g)
    out = m.apply(v, x, g)
    assert out.shape == (1, 8, 8, 5)

    unary = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    crf = PacCRF(num_classes=4, num_steps=2, dilations=(1, 2))
    v = crf.init(jax.random.key(0), unary, g)
    q = crf.apply(v, unary, g)
    assert q.shape == (1, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(q).sum(-1), 1.0, atol=1e-5)
    # Zero-init compat => CRF output equals softmax(unary).
    np.testing.assert_allclose(
        np.asarray(q), np.asarray(jax.nn.softmax(unary, -1)), atol=1e-6)


def test_pacpool_uniform_kernel_is_box_sum():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 5, 5, 2)).astype(np.float32))
    kern = jnp.ones((1, 5, 5, 9), jnp.float32)
    out = np.asarray(pacpool2d(x, kern, 3))
    # Interior pixel = 3x3 box sum.
    expected = np.asarray(x)[0, 1:4, 1:4].sum((0, 1))
    np.testing.assert_allclose(out[0, 2, 2], expected, atol=1e-5)
