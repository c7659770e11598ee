"""Pallas 3x3 convolution for small channel counts (TPU).

Why: HRNet's stride-4 branch runs 3x3 convs at C=48 — only 48 of the
MXU's 128 lanes are live, and XLA's layout assignment additionally
inserts ~24 ms/step of pure layout-conversion ("data formatting") ops
around these convs plus their backward (profiled on TPU v5e: branch0 of
stages 3/4 costs 74 ms of a 280 ms step; the convs themselves run at
35-46 TF/s).  This kernel computes the same conv as an explicit
patch-matmul [rows, 9C] @ [9C, Co]:

  * stays in the C-minor (NHWC) layout end to end — no relayouts;
  * im2col patches are built inside VMEM (the 9 shifted copies never
    touch HBM);
  * contracts over 9C=432 at once, so the systolic array sees one deep
    contraction instead of nine K=48 passes.

Row halos: DMA slices must be tile-aligned (8 sublanes / full 128-lane
minor), so overlapping input blocks are delivered as TWO auto-pipelined
BlockSpecs — the aligned 'body' rows plus an 8-row 'tail' block that
provides the bottom halo.  The input is pre-padded so the top halo of
block j falls inside body block j itself (t = conv_row + block_pad - 1).

Semantics match `lax.conv_general_dilated` with NHWC, 3x3, stride 1,
SAME zero padding (the reference conv3x3 in every BasicBlock,
/root/reference/lib/models/backbones/hrnet/hrnet_backbone.py:22-27).

Measured results (TPU v5e, [8,128,256,48] bf16):
  * isolated: 155 us/conv = 70.3 TF/s — at the 48-lane MXU roofline
    (74 TF/s), 2.0x the XLA conv measured in the train graph (35 TF/s)
    and with zero layout-conversion overhead;
  * in the FULL train step (network.pallas_conv=true): 17.9 img/s vs
    28.1 baseline — a net LOSS.  The profile shows why: each custom
    call is a scheduling barrier (in-graph pallas convs run 0.46 ms vs
    0.155 isolated), the `jnp.pad` operands must materialize (+30
    ms/step), and BN/ReLU can no longer fuse into convs (+60 ms of
    standalone loop fusions).  Winning end-to-end would need whole
    branch-chains fused into one kernel, which cross-batch BN stats
    make impractical.  The flag therefore defaults to OFF; the kernel
    stands as the speed-of-light datapoint for this op class and as a
    building block for inference-mode fusion (no batch stats there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAIL = 8  # tail-halo block rows (min sublane-aligned chunk)


def _conv3x3_kernel(body_ref, tail_ref, w_ref, o_ref, patches_ref, *,
                    block_h: int, sub_h: int, out_w: int, cin: int):
    """One (batch, row-block) program.

    body_ref: [1, block_h, Wp, C]  input rows t in [j*bh, (j+1)*bh)
    tail_ref: [1, _TAIL, Wp, C]    input rows t in [(j+1)*bh, +8)
    w_ref:    [9C, Co]             tap-major weights
    o_ref:    [1, block_h, W, Co]
    patches_ref: [sub_h * W, 9C]   scratch

    Output row h (block-local) reads input rows h+6+dy, dy in 0..2 —
    rows >= block_h come from the tail block.
    """
    num_sub = block_h // sub_h

    for sub in range(num_sub):
        for hh in range(sub_h):
            h = sub * sub_h + hh
            for dy in range(3):
                idx = h + 6 + dy
                src = (body_ref if idx < block_h else tail_ref)
                row = idx if idx < block_h else idx - block_h
                for dx in range(3):
                    t = dy * 3 + dx
                    patches_ref[hh * out_w:(hh + 1) * out_w,
                                t * cin:(t + 1) * cin] = (
                        src[0, row, dx:dx + out_w, :]
                    )
        acc = jnp.dot(patches_ref[:], w_ref[:],
                      preferred_element_type=jnp.float32)
        o_ref[0, sub * sub_h:(sub + 1) * sub_h] = acc.reshape(
            sub_h, out_w, -1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_h", "sub_h",
                                             "interpret"))
def conv3x3_small_c(x: jnp.ndarray, w: jnp.ndarray, block_h: int = 32,
                    sub_h: int = 8, interpret: bool = False) -> jnp.ndarray:
    """3x3 SAME conv, NHWC, stride 1, f32 accumulate, out dtype = x dtype.

    x: [B, H, W, C]; w: [3, 3, C, Co] (HWIO, as flax nn.Conv stores it).
    """
    b, h, wd, c = x.shape
    co = w.shape[-1]
    assert w.shape[:3] == (3, 3, c), w.shape
    assert h % block_h == 0 and block_h % sub_h == 0, (h, block_h, sub_h)
    # Row t = conv_padded_row + 6: 7 zero rows on top (6 alignment + the
    # conv zero-pad row), the conv bottom zero-pad at t = H + 7 — total
    # H + 8 rows, so the last tail block [H, H+8) stays in bounds.
    # Width pads to a multiple of 8 for the same alignment rule.
    wpad = (-(wd + 2)) % 8 + 1
    xp = jnp.pad(x, ((0, 0), (7, 1), (1, wpad), (0, 0)))
    w2 = w.astype(x.dtype).reshape(9 * c, co)
    wp = wd + 1 + wpad

    grid = (b, h // block_h)
    return pl.pallas_call(
        functools.partial(_conv3x3_kernel, block_h=block_h, sub_h=sub_h,
                          out_w=wd, cin=c),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, co), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_h, wp, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, _TAIL, wp, c),
                lambda i, j, _r=block_h // _TAIL: (i, (j + 1) * _r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9 * c, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_h, wd, co),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((sub_h * wd, 9 * c), x.dtype),
        ],
        interpret=interpret,
    )(xp, xp, w2)


# ---------------------------------------------------------------------------
# Backward kernels + differentiable wrapper
# ---------------------------------------------------------------------------

def _conv3x3_dw_kernel(body_ref, tail_ref, g_ref, dw_ref, patches_ref, *,
                       block_h: int, sub_h: int, out_w: int, cin: int):
    """Accumulate dW[9C, Co] += im2col(x_block)^T @ g_block.

    Same patch construction as the forward; the [9C, Co] accumulator
    lives in one VMEM block revisited by every grid step (constant
    index_map), contracting over all (batch, row) blocks.
    """
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, j == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    num_sub = block_h // sub_h
    for sub in range(num_sub):
        for hh in range(sub_h):
            h = sub * sub_h + hh
            for dy in range(3):
                idx = h + 6 + dy
                src = (body_ref if idx < block_h else tail_ref)
                row = idx if idx < block_h else idx - block_h
                for dx in range(3):
                    t = dy * 3 + dx
                    patches_ref[hh * out_w:(hh + 1) * out_w,
                                t * cin:(t + 1) * cin] = (
                        src[0, row, dx:dx + out_w, :]
                    )
        dw_ref[:] += jax.lax.dot_general(
            patches_ref[:],
            g_ref[0, sub * sub_h:(sub + 1) * sub_h].reshape(
                sub_h * out_w, -1),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _conv3x3_dw(x: jnp.ndarray, g: jnp.ndarray, block_h: int,
                sub_h: int, interpret: bool = False) -> jnp.ndarray:
    """dW for the 3x3 SAME conv: [3, 3, C, Co] in f32."""
    b, h, wd, c = x.shape
    co = g.shape[-1]
    wpad = (-(wd + 2)) % 8 + 1
    xp = jnp.pad(x, ((0, 0), (7, 1), (1, wpad), (0, 0)))
    wp = wd + 1 + wpad

    grid = (b, h // block_h)
    dw = pl.pallas_call(
        functools.partial(_conv3x3_dw_kernel, block_h=block_h,
                          sub_h=sub_h, out_w=wd, cin=c),
        out_shape=jax.ShapeDtypeStruct((9 * c, co), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_h, wp, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, _TAIL, wp, c),
                lambda i, j, _r=block_h // _TAIL: (i, (j + 1) * _r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, block_h, wd, co), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * c, co), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((sub_h * wd, 9 * c), x.dtype),
        ],
        interpret=interpret,
    )(xp, xp, g)
    return dw.reshape(3, 3, c, co)


def pick_block_h(h: int) -> int:
    """Largest supported row-block size dividing H (0 = unsupported)."""
    for bh in (32, 16, 8):
        if h % bh == 0:
            return bh
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3(x: jnp.ndarray, w: jnp.ndarray,
            interpret: bool = False) -> jnp.ndarray:
    """Differentiable Pallas 3x3 SAME conv (stride 1, NHWC, HWIO).

    dX reuses the forward kernel with spatially flipped, transposed
    weights (the stride-1 transposed conv identity); dW is the
    accumulating patch kernel above.
    """
    bh = pick_block_h(x.shape[1])
    return conv3x3_small_c(x, w.astype(x.dtype), block_h=bh,
                           sub_h=min(bh, 16), interpret=interpret)


def _conv3x3_fwd(x, w, interpret):
    return conv3x3(x, w, interpret), (x, w)


def _conv3x3_bwd(interpret, res, g):
    x, w = res
    bh = pick_block_h(x.shape[1])
    w_t = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3).astype(g.dtype)
    dx = conv3x3_small_c(g, w_t, block_h=bh, sub_h=min(bh, 16),
                         interpret=interpret)
    # dW carries both the x and g blocks plus the patch scratch — at
    # block_h=32/C=48 that exceeds the 16MB scoped-VMEM budget, so cap
    # its blocks at 16 rows.
    bh_dw = min(bh, 16)
    dw = _conv3x3_dw(x, g, block_h=bh_dw, sub_h=min(bh_dw, 8),
                     interpret=interpret)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def supported(x_shape, kernel_size: int, strides: int, dilation: int,
              max_c: int = 64) -> bool:
    """Is the Pallas path applicable (and likely profitable) here?

    Profitable = small channel count (the MXU-lane-starved regime where
    XLA's conv + layout choices were measured at ~1/2 the attainable
    rate); applicable = 3x3 stride-1 undilated with 8-aligned height.
    """
    _, h, _, c = x_shape
    return (kernel_size == 3 and strides == 1 and dilation == 1
            and c <= max_c and pick_block_h(h) > 0)
