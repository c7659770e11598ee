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
    PacConvTranspose2d,
    PacPool2d,
    extract_patches,
    make_smooth_kernel,
    packernel2d,
    pacconv_transpose2d,
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
    m = PacConv2d(features=5)
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


def _torch_ref_pac():
    import sys

    sys.path.insert(0, "tests")
    import torch_ref

    torch_ref.setup_reference()
    from lib.extensions.pacnet import pac as ref_pac

    return ref_pac


def test_pacconv_transpose2d_matches_torch_native():
    """pacconv_transpose2d vs the reference native impl (pac.py:481-500):
    same zero-stuff + pad + conv semantics, io-transposed weight."""
    import torch

    ref_pac = _torch_ref_pac()
    rng = np.random.default_rng(7)
    B, H, W, Cin, Cout, k, s, op = 1, 5, 6, 3, 4, 3, 2, 1
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    Ho = (H - 1) * s - 2 * (k // 2) + (k - 1) + op + 1
    Wo = (W - 1) * s - 2 * (k // 2) + (k - 1) + op + 1
    guide = rng.standard_normal((B, Ho, Wo, 2)).astype(np.float32)
    w = rng.standard_normal((k, k, Cin, Cout)).astype(np.float32)
    b = rng.standard_normal((Cout,)).astype(np.float32)

    kern = packernel2d(jnp.asarray(guide), k)
    out_j = pacconv_transpose2d(
        jnp.asarray(x), kern, jnp.asarray(w), jnp.asarray(b),
        stride=s, output_padding=op)
    assert out_j.shape == (B, Ho, Wo, Cout)

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    # torch ConvTranspose2d weight layout: (Cin, Cout, k, k).
    wt = torch.from_numpy(np.transpose(w, (2, 3, 0, 1)))
    kt = torch.from_numpy(np.transpose(np.asarray(kern), (0, 3, 1, 2))
                          ).reshape(B, 1, k, k, Ho, Wo)
    out_t = ref_pac.pacconv_transpose2d(
        xt, kt, wt, torch.from_numpy(b), stride=s, padding=k // 2,
        output_padding=op, native_impl=True)
    out_t = np.transpose(out_t.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-4)


def test_packernel2d_inv_and_smooth_match_torch_native():
    """inv_* kernel law + gaussian smooth-kernel center vs the reference
    native packernel2d (pac.py:404-433)."""
    import torch

    ref_pac = _torch_ref_pac()
    rng = np.random.default_rng(8)
    B, H, W, Cf, k = 1, 7, 7, 2, 3
    g = rng.standard_normal((B, H, W, Cf)).astype(np.float32)
    gt = torch.from_numpy(np.transpose(g, (0, 3, 1, 2)))

    # inv kernel: alpha=2, lambda=-1.
    kern_j = packernel2d(jnp.asarray(g), k, kernel_type="inv_2_-1",
                         inv_alpha=jnp.asarray(2.0),
                         inv_lambda=jnp.asarray(-1.0))
    kern_t, _ = ref_pac.packernel2d(
        gt, kernel_size=k, padding=k // 2, kernel_type="inv_2_-1",
        inv_alpha=torch.tensor(2.0), inv_lambda=torch.tensor(-1.0),
        native_impl=True)
    kern_t = kern_t.reshape(B, k * k, H, W).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(kern_j), kern_t, atol=1e-4)

    # gaussian smooth kernel center.
    sk = make_smooth_kernel("gaussian")
    kern_j = packernel2d(jnp.asarray(g), k, smooth_kernel=sk)
    smooth_t = torch.tensor([0.25, 0.5, 0.25])
    smooth_t = (smooth_t[:, None] * smooth_t[None, :])[None, None]
    kern_t, _ = ref_pac.packernel2d(
        gt, kernel_size=k, padding=k // 2, smooth_kernel_type="gaussian",
        smooth_kernel=smooth_t, native_impl=True)
    kern_t = kern_t.reshape(B, k * k, H, W).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(kern_j), kern_t, atol=1e-4)


def test_pac_transpose_and_pool_modules():
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 3)).astype(np.float32))
    g_out = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    m = PacConvTranspose2d(features=5, stride=2, output_padding=1)
    v = m.init(jax.random.key(0), x, g_out)
    out = m.apply(v, x, g_out)
    assert out.shape == (1, 8, 8, 5)

    g = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    p = PacPool2d(kernel_size=3, normalize_kernel=True)
    v = p.init(jax.random.key(0), x, g)
    out = p.apply(v, x, g)
    assert out.shape == (1, 4, 4, 3)

    # inv_* kernel module variant exposes learnable alpha/lambda.
    m = PacConv2d(features=4, kernel_type="inv_0.5_2")
    v = m.init(jax.random.key(0), x, g)
    assert "inv_alpha" in v["params"] and "inv_lambda" in v["params"]
    out = m.apply(v, x, g)
    assert out.shape == (1, 4, 4, 4)
