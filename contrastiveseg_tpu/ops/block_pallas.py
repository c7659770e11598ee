"""Fused inference-mode HRNet BasicBlock as ONE Pallas kernel.

The round-2 per-conv Pallas experiment (ops/conv_pallas.py) proved the
small-channel 3x3 conv runs at the 48-lane MXU roofline in isolation but
LOSES end-to-end in training: each custom call is a scheduling barrier
and BN/ReLU fusion is forfeited, and whole-chain fusion is blocked by
cross-batch batch-norm statistics.  At EVAL time there are no batch
stats — BN folds into a per-channel scale/bias — so an entire BasicBlock

    y = relu( conv2(relu(conv1(x) * s1 + b1)) * s2 + b2 + x )

(reference hrnet_backbone.py:35-66, the stride-1 residual block every
HRNet branch is made of) becomes a pure function of x and 6 small
tensors, computable with the intermediate activation y1 living entirely
in VMEM: one kernel, two deep [rows*W, 9C] @ [9C, C] contractions, zero
HBM round-trips or layout conversions between them.

Coordinate scheme (rows): the input is pre-padded with 6 zero rows on
top and 2 on the bottom; output row h of block j reads conv1 outputs at
block-local rows h-1..h+1, which in turn read padded-input rows
(h-2..h+2) + 6.  An 8-row tail block supplies the bottom halo (DMA
blocks must stay sublane-aligned — see the conv_pallas notes).  Widths:
conv1 is evaluated on W+2 columns (one halo column each side for conv2).

Measured (TPU v5e, [8, 128, 256, 48] bf16, tools/bench_block_pallas.py):
**fused 1130 us/block (19.2 TF/s) vs XLA 793 us (27.4 TF/s) — 0.70x, a
NEGATIVE result.**  Two reasons: (1) XLA's eval-mode lowering already
folds the BN affine + ReLU into its convs and runs them at 27 TF/s —
much better than the 35 TF/s-against-70 story inside the TRAIN graph
that motivated this kernel (no batch-stat barriers, no layout flips at
eval); (2) the in-kernel patch assembly (per-row sublane copies) runs
twice here and the stage-1 halo width (W+2, not 8-aligned) forces
strided copies, so the VMEM-resident y1 saves one HBM round-trip but
costs more in copy overhead than it saves in bandwidth.  The kernel is
kept as an equivalence-tested building block and as the documented
datapoint: at eval time XLA needs no Pallas help on this block shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAIL = 8


def _fused_block_kernel(body_ref, tail_ref, w1_ref, w2_ref, bias_ref,
                        o_ref, y1_ref, patches_ref, res_ref, *,
                        block_h: int, sub_h: int, out_w: int, cin: int,
                        img_h: int):
    """One (batch, row-block) program.

    body_ref: [1, block_h, Wp, C]   padded-input rows [j*bh, (j+1)*bh)
    tail_ref: [1, _TAIL, Wp, C]     padded-input rows [(j+1)*bh, +8)
    w1_ref:   [9C, C]  conv1 weights with s1 folded into out channels
    w2_ref:   [9C, C]  conv2 weights with s2 folded
    bias_ref: [8, C]   row 0 = b1, row 1 = b2 (8 sublanes for alignment)
    o_ref:    [1, block_h, W, C]
    y1_ref:   [block_h + 2, Wy, C]  scratch: relu(conv1) rows h-1..bh+1
    patches_ref: [sub_h * (W + 2), 9C] scratch

    Stage 1 computes y1 at block-local output rows k in [-1, block_h+1)
    over W+2 columns; y1_ref row r holds k = r - 1.  Output row h then
    contracts y1 rows h-1..h+1 / cols n..n+2.
    """
    y1_w = out_w + 2
    n1 = block_h + 2  # stage-1 rows

    # ---- stage 1: y1 = relu(conv1(x) * s1 + b1) on the haloed range.
    done = 0
    while done < n1:
        rows = min(sub_h, n1 - done)
        for hh in range(rows):
            k = done + hh - 1  # block-local output row of y1
            for dy in range(3):
                idx = k + 5 + dy  # padded-input row (top pad 6, center +6)
                src = body_ref if idx < block_h else tail_ref
                row = idx if idx < block_h else idx - block_h
                for dx in range(3):
                    t = dy * 3 + dx
                    patches_ref[hh * y1_w:(hh + 1) * y1_w,
                                t * cin:(t + 1) * cin] = (
                        src[0, row, dx:dx + y1_w, :]
                    )
        acc = jnp.dot(patches_ref[:rows * y1_w], w1_ref[:],
                      preferred_element_type=jnp.float32)
        acc = jnp.maximum(acc + bias_ref[0][None, :], 0.0)
        acc = acc.reshape(rows, y1_w, -1)
        # conv2's SAME padding expects ZEROS outside the image — not
        # conv1 evaluated on padding (relu(b1) != 0 in general).  Mask
        # the halo row/column entries that fall outside [0, H) x [0, W).
        j = pl.program_id(1)
        row0 = j * block_h + done - 1  # image row of this chunk's first y1
        gi = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (1, y1_w, 1), 1)
        mask = ((gi >= 0) & (gi < img_h) & (ci >= 1) & (ci <= out_w))
        acc = jnp.where(mask, acc, 0.0)
        y1_ref[done:done + rows] = acc.astype(y1_ref.dtype)
        done += rows

    # ---- stage 2: y = relu(conv2(y1) * s2 + b2 + x).
    num_sub = block_h // sub_h
    for sub in range(num_sub):
        for hh in range(sub_h):
            h = sub * sub_h + hh
            for dy in range(3):
                r = h + dy  # y1_ref row for output row h, tap dy-1
                for dx in range(3):
                    t = dy * 3 + dx
                    patches_ref[hh * out_w:(hh + 1) * out_w,
                                t * cin:(t + 1) * cin] = (
                        y1_ref[r, dx:dx + out_w, :]
                    )
            # Residual: image row h of this block sits at padded row
            # h + 6 (top pad), which spills into the tail block for the
            # last 6 output rows; cols shift by the 2-column left pad.
            ridx = h + 6
            rsrc = body_ref if ridx < block_h else tail_ref
            rrow = ridx if ridx < block_h else ridx - block_h
            res_ref[hh] = rsrc[0, rrow, 2:2 + out_w, :]
        acc = jnp.dot(patches_ref[:sub_h * out_w], w2_ref[:],
                      preferred_element_type=jnp.float32)
        acc = acc + bias_ref[1][None, :]
        acc = acc.reshape(sub_h, out_w, -1) + res_ref[:].astype(jnp.float32)
        o_ref[0, sub * sub_h:(sub + 1) * sub_h] = jnp.maximum(
            acc, 0.0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_h", "sub_h",
                                             "interpret"))
def fused_basic_block_eval(
    x: jnp.ndarray,      # [B, H, W, C]
    w1: jnp.ndarray,     # [3, 3, C, C] conv1 (HWIO)
    s1: jnp.ndarray,     # [C] folded BN1 scale = gamma1/sqrt(var1+eps)
    b1: jnp.ndarray,     # [C] folded BN1 bias  = beta1 - mean1*s1
    w2: jnp.ndarray,
    s2: jnp.ndarray,
    b2: jnp.ndarray,
    block_h: int = 16,
    sub_h: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """relu(conv2(relu(conv1(x)*s1+b1))*s2+b2 + x), all in one kernel."""
    b, h, wd, c = x.shape
    assert w1.shape == (3, 3, c, c) and w2.shape == (3, 3, c, c)
    assert h % block_h == 0 and block_h % sub_h == 0, (h, block_h, sub_h)
    # Rows: top pad 6, bottom pad 2 -> H + 8 total; the last tail block
    # [H, H+8) is exactly in bounds.  Cols: left pad 2, right pad to
    # alignment (>= 4 data pad: 2 halo + conv pad each side).
    wpad = (-(wd + 6)) % 8 + 4
    xp = jnp.pad(x, ((0, 0), (6, 2), (2, wpad), (0, 0)))
    wp = wd + 2 + wpad

    w1f = (w1 * s1[None, None, None, :]).astype(x.dtype).reshape(9 * c, c)
    w2f = (w2 * s2[None, None, None, :]).astype(x.dtype).reshape(9 * c, c)
    bias = jnp.zeros((8, c), jnp.float32).at[0].set(b1).at[1].set(b2)

    grid = (b, h // block_h)
    return pl.pallas_call(
        functools.partial(_fused_block_kernel, block_h=block_h,
                          sub_h=sub_h, out_w=wd, cin=c, img_h=h),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_h, wp, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, _TAIL, wp, c),
                lambda i, j, _r=block_h // _TAIL: (i, (j + 1) * _r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9 * c, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_h, wd, c),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_h + 2, wd + 2, c), x.dtype),
            pltpu.VMEM((sub_h * (wd + 2), 9 * c), x.dtype),
            pltpu.VMEM((sub_h, wd, c), x.dtype),
        ],
        interpret=interpret,
    )(xp, xp, w1f, w2f, bias)


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """BN eval affine: y = x*s + b with s=gamma/sqrt(var+eps),
    b = beta - mean*s (ModuleHelper BNReLU eval semantics)."""
    s = scale / jnp.sqrt(var + eps)
    return s, bias - mean * s


def reference_block_eval(x, w1, s1, b1, w2, s2, b2):
    """The XLA formulation of the same block (equivalence oracle + the
    baseline for the fused-vs-XLA benchmark)."""
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x, w1.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn)
    y = jnp.maximum(y * s1 + b1, 0.0).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        y, w2.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn)
    return jnp.maximum(y * s2 + b2 + x, 0.0).astype(x.dtype)
