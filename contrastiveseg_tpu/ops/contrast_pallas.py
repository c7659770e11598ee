"""Pallas TPU kernel: fused anchors x (pixels+queue) InfoNCE.

The mem-variant contrast loss reduces a [max_samples, C*2*memory_size]
similarity matrix (~[1024, 190k]) against label masks.  ops/contrast_stream
expresses the streaming two-pass algorithm in jnp/lax.scan; this module is
the hand-fused Pallas version — one kernel keeps the anchors pinned in
VMEM, streams contrast blocks from HBM through the MXU, and fuses the mask
construction, the online max/negative-sum rescaling and the positive
log-prob reduction into the matmul epilogue, so each contrast element is
read exactly twice (fwd) / once (bwd) with no intermediate HBM traffic.

Grid layout: (2, K/BK) — phase 0 accumulates the running row max `m` and
rescaled negative sum `ns` into VMEM scratch; phase 1 (same kernel,
sequential grid on TPU) uses the finalized m/ns to accumulate the positive
log-prob sum S1, the positive count P, and the backward helper
T = sum_pos 1/(e_ij + ns).  The backward kernel replays the blocks once,
building d/dlogits analytically and contracting with the contrast block on
the MXU.  Value/grad equivalence vs the jnp paths is tested in
tests/test_contrast_pallas.py.

Reference math: loss_contrast_mem.py:107-152 (see ops/contrast.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _fwd_kernel(
    a_f_ref, a_l_ref, c_f_ref, c_l_ref, c_v_ref,  # inputs
    m_ref, ns_ref, s1_ref, t_ref, p_ref,  # outputs [M, 1]
    acc_m, acc_ns,  # VMEM scratch [M, 1]
    *, temperature: float,
):
    phase = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    logits = jax.lax.dot_general(
        a_f_ref[:], c_f_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / temperature)  # [M, BK]

    same = a_l_ref[:] == c_l_ref[:].reshape(1, -1)  # [M, BK]
    ok = (c_v_ref[:] != 0).reshape(1, -1)
    pos = jnp.logical_and(same, ok)
    neg = jnp.logical_and(jnp.logical_not(same), ok)

    @pl.when(phase == 0)
    def _():
        @pl.when(j == 0)
        def _():
            acc_m[:] = jnp.full_like(acc_m, _NEG_INF)
            acc_ns[:] = jnp.zeros_like(acc_ns)
            p_ref[:] = jnp.zeros_like(p_ref)

        masked = jnp.where(ok, logits, _NEG_INF)
        blk_max = jnp.max(masked, axis=1, keepdims=True)  # [M, 1]
        m_old = acc_m[:]
        m_new = jnp.maximum(m_old, blk_max)
        scale = jnp.exp(m_old - m_new)
        e = jnp.where(ok, jnp.exp(logits - m_new), 0.0)
        acc_ns[:] = acc_ns[:] * scale + jnp.sum(
            jnp.where(neg, e, 0.0), axis=1, keepdims=True
        )
        acc_m[:] = m_new
        p_ref[:] = p_ref[:] + jnp.sum(
            pos.astype(jnp.float32), axis=1, keepdims=True
        )

        @pl.when(j == nj - 1)
        def _():
            m_ref[:] = acc_m[:]
            ns_ref[:] = acc_ns[:]

    @pl.when(phase == 1)
    def _():
        @pl.when(j == 0)
        def _():
            s1_ref[:] = jnp.zeros_like(s1_ref)
            t_ref[:] = jnp.zeros_like(t_ref)

        m = acc_m[:]
        ns = acc_ns[:]
        sh = logits - m
        e = jnp.exp(sh)
        denom = e + ns + 1e-30
        s1_ref[:] = s1_ref[:] + jnp.sum(
            jnp.where(pos, sh - jnp.log(denom), 0.0), axis=1, keepdims=True
        )
        t_ref[:] = t_ref[:] + jnp.sum(
            jnp.where(pos, 1.0 / denom, 0.0), axis=1, keepdims=True
        )


def _bwd_kernel(
    a_f_ref, a_l_ref, c_f_ref, c_l_ref, c_v_ref, m_ref, ns_ref, t_ref, w_ref,
    da_ref,  # output [M, D]
    *, temperature: float,
):
    j = pl.program_id(0)

    logits = jax.lax.dot_general(
        a_f_ref[:], c_f_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / temperature)
    same = a_l_ref[:] == c_l_ref[:].reshape(1, -1)
    ok = (c_v_ref[:] != 0).reshape(1, -1)
    pos = jnp.logical_and(same, ok)
    neg = jnp.logical_and(jnp.logical_not(same), ok)

    e = jnp.exp(logits - m_ref[:])
    denom = e + ns_ref[:] + 1e-30
    w = w_ref[:]
    dlogit = jnp.where(pos, w * (1.0 - e / denom), 0.0)
    dlogit = dlogit + jnp.where(neg, -w * t_ref[:] * e, 0.0)

    @pl.when(j == 0)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)

    da_ref[:] = da_ref[:] + jax.lax.dot_general(
        dlogit * (1.0 / temperature), c_f_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pad_contrast(c_f, c_l, c_v, bk):
    K = c_f.shape[0]
    nj = -(-K // bk)
    Kp = nj * bk
    if Kp != K:
        c_f = jnp.pad(c_f, ((0, Kp - K), (0, 0)))
        c_l = jnp.pad(c_l, (0, Kp - K), constant_values=-1)
        c_v = jnp.pad(c_v, (0, Kp - K))
    return c_f, c_l, c_v, nj


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def pallas_contrastive_loss(
    a_f: jnp.ndarray,  # [M, D] fp32
    a_l: jnp.ndarray,  # [M] int32
    a_v: jnp.ndarray,  # [M] bool
    c_f: jnp.ndarray,  # [K, D] fp32 (stop-gradient state)
    c_l: jnp.ndarray,  # [K] int32
    c_v: jnp.ndarray,  # [K] bool
    temperature: float,
    base_temperature: float,
    block_k: int = 2048,
) -> jnp.ndarray:
    loss, _ = _pallas_fwd(a_f, a_l, a_v, c_f, c_l, c_v, temperature,
                          base_temperature, block_k)
    return loss


def _run_fwd_kernel(a_f, a_l, c_f, c_l, c_v, temperature, block_k):
    M, D = a_f.shape
    c_f, c_l, c_v, nj = _pad_contrast(c_f, c_l, c_v, block_k)
    out_shape = [jax.ShapeDtypeStruct((M, 1), jnp.float32)] * 5
    grid = (2, nj)
    kernel = functools.partial(_fwd_kernel, temperature=temperature)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, D), lambda p, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda p, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, D), lambda p, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, 1), lambda p, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, 1), lambda p, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((M, 1), lambda p, j: (0, 0), memory_space=pltpu.VMEM)
        ] * 5,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((M, 1), jnp.float32),
            pltpu.VMEM((M, 1), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(a_f, a_l.reshape(M, 1), c_f, c_l.reshape(-1, 1),
      c_v.astype(jnp.int32).reshape(-1, 1))


def _pallas_fwd(a_f, a_l, a_v, c_f, c_l, c_v, temperature, base_temperature,
                block_k):
    m, ns, s1, t, p = _run_fwd_kernel(
        a_f, a_l, c_f, c_l, c_v, temperature, block_k
    )
    m, ns, s1, t, p = (x[:, 0] for x in (m, ns, s1, t, p))
    row_ok = a_v & (p > 0)
    R = jnp.maximum(jnp.sum(row_ok), 1)
    per_row = -(temperature / base_temperature) * s1 / jnp.maximum(p, 1)
    loss = jnp.sum(jnp.where(row_ok, per_row, 0.0)) / R
    return loss, (a_f, a_l, a_v, c_f, c_l, c_v, m, ns, t, p, R)


def _pallas_bwd(temperature, base_temperature, block_k, res, g):
    a_f, a_l, a_v, c_f, c_l, c_v, m, ns, t, p, R = res
    M, D = a_f.shape
    row_ok = a_v & (p > 0)
    w = jnp.where(
        row_ok,
        g * (-(temperature / base_temperature)) / (R * jnp.maximum(p, 1)),
        0.0,
    ).astype(jnp.float32)
    c_fp, c_lp, c_vp, nj = _pad_contrast(c_f, c_l, c_v, block_k)
    kernel = functools.partial(_bwd_kernel, temperature=temperature)
    da = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec((M, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, D), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, D), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(
        a_f, a_l.reshape(M, 1), c_fp, c_lp.reshape(-1, 1),
        c_vp.astype(jnp.int32).reshape(-1, 1),
        m.reshape(M, 1), ns.reshape(M, 1), t.reshape(M, 1), w.reshape(M, 1),
    )
    return (
        da,
        jnp.zeros_like(a_l),
        jnp.zeros_like(a_v),
        jnp.zeros_like(c_f),
        jnp.zeros_like(c_l),
        jnp.zeros_like(c_v),
    )


pallas_contrastive_loss.defvjp(_pallas_fwd, _pallas_bwd)
