"""Pallas TPU kernel: fused anchors x (pixels+queue) InfoNCE.

The mem-variant contrast loss reduces a [max_samples, C*2*memory_size]
similarity matrix (~[1024, 190k]) against label masks.  ops/contrast_stream
expresses the streaming two-pass algorithm in jnp/lax.scan; this module is
the hand-fused Pallas version — anchors pinned in VMEM, contrast blocks
streamed from HBM through the MXU, with the mask construction, online
max/negative-sum rescaling and positive log-prob reduction fused into the
matmul epilogue, so each contrast element is read exactly twice (fwd) /
once (bwd) with no intermediate HBM traffic.

Three small kernels (pass1 max/negsum, pass2 poslogprob, bwd dA), each a
1-D grid over contrast blocks with VMEM scratch carrying the running
reductions — split this way to stay inside the v5e VMEM budget (a fused
two-phase variant exceeded it).  Value/grad equivalence vs the jnp paths:
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


def _logits(a_ref, c_ref, temperature):
    return jax.lax.dot_general(
        a_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / temperature)


def _masks(a_l_ref, c_l_ref, c_v_ref):
    # c_l / c_v blocks are laid out [8, BK] lane-major (8-replicated rows:
    # Mosaic needs sublane multiples of 8, and a [BK, 1] -> [1, BK]
    # reshape makes its register allocator spill 200+MB).  Row 0 is used.
    same = a_l_ref[:] == c_l_ref[0:1, :]  # [M, 1] vs [1, BK] -> [M, BK]
    ok = c_v_ref[0:1, :] != 0
    return same, ok


def _pass1_kernel(a_f_ref, a_l_ref, c_f_ref, c_l_ref, c_v_ref,
                  m_ref, ns_ref, p_ref, *, temperature):
    j = pl.program_id(0)
    logits = _logits(a_f_ref, c_f_ref, temperature)
    same, ok = _masks(a_l_ref, c_l_ref, c_v_ref)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        ns_ref[:] = jnp.zeros_like(ns_ref)
        p_ref[:] = jnp.zeros_like(p_ref)

    masked = jnp.where(ok, logits, _NEG_INF)
    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, jnp.max(masked, axis=1, keepdims=True))
    e = jnp.where(ok & ~same, jnp.exp(logits - m_new), 0.0)
    ns_ref[:] = ns_ref[:] * jnp.exp(m_old - m_new) + jnp.sum(
        e, axis=1, keepdims=True
    )
    m_ref[:] = m_new
    p_ref[:] = p_ref[:] + jnp.sum(
        (same & ok).astype(jnp.float32), axis=1, keepdims=True
    )


def _pass2_kernel(a_f_ref, a_l_ref, c_f_ref, c_l_ref, c_v_ref, m_ref, ns_ref,
                  s1_ref, t_ref, *, temperature):
    j = pl.program_id(0)
    logits = _logits(a_f_ref, c_f_ref, temperature)
    same, ok = _masks(a_l_ref, c_l_ref, c_v_ref)
    pos = same & ok

    @pl.when(j == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        t_ref[:] = jnp.zeros_like(t_ref)

    sh = logits - m_ref[:]
    e = jnp.exp(sh)
    denom = e + ns_ref[:] + 1e-30
    s1_ref[:] = s1_ref[:] + jnp.sum(
        jnp.where(pos, sh - jnp.log(denom), 0.0), axis=1, keepdims=True
    )
    t_ref[:] = t_ref[:] + jnp.sum(
        jnp.where(pos, 1.0 / denom, 0.0), axis=1, keepdims=True
    )


def _bwd_kernel(a_f_ref, a_l_ref, c_f_ref, c_l_ref, c_v_ref, m_ref, ns_ref,
                t_ref, w_ref, da_ref, *, temperature):
    j = pl.program_id(0)
    logits = _logits(a_f_ref, c_f_ref, temperature)
    same, ok = _masks(a_l_ref, c_l_ref, c_v_ref)
    pos = same & ok
    neg = (~same) & ok

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


def _rep8(x, nj, block_k):
    """[nj*block_k] -> [nj*8, block_k] with each row block replicated 8x."""
    r = x.reshape(nj, 1, block_k)
    return jnp.broadcast_to(r, (nj, 8, block_k)).reshape(nj * 8, block_k)


def _common_specs(M, D, block_k):
    a_specs = [
        pl.BlockSpec((M, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((M, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_k, D), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, block_k), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, block_k), lambda j: (j, 0), memory_space=pltpu.VMEM),
    ]
    mvec = pl.BlockSpec((M, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    return a_specs, mvec


_INTERPRET = None


def _interpret() -> bool:
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() != "tpu"
    return _INTERPRET


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
    block_k: int = 1024,
) -> jnp.ndarray:
    loss, _ = _pallas_fwd(a_f, a_l, a_v, c_f, c_l, c_v, temperature,
                          base_temperature, block_k)
    return loss


def _pallas_fwd(a_f, a_l, a_v, c_f, c_l, c_v, temperature, base_temperature,
                block_k):
    M, D = a_f.shape
    c_fp, c_lp, c_vp, nj = _pad_contrast(c_f, c_l, c_v, block_k)
    a_specs, mvec = _common_specs(M, D, block_k)
    ins = (a_f, a_l.reshape(M, 1), c_fp,
           _rep8(c_lp, nj, block_k), _rep8(c_vp.astype(jnp.int32), nj, block_k))

    m, ns, p = pl.pallas_call(
        functools.partial(_pass1_kernel, temperature=temperature),
        grid=(nj,),
        in_specs=a_specs,
        out_specs=[mvec] * 3,
        out_shape=[jax.ShapeDtypeStruct((M, 1), jnp.float32)] * 3,
        interpret=_interpret(),
    )(*ins)

    s1, t = pl.pallas_call(
        functools.partial(_pass2_kernel, temperature=temperature),
        grid=(nj,),
        in_specs=a_specs + [mvec, mvec],
        out_specs=[mvec] * 2,
        out_shape=[jax.ShapeDtypeStruct((M, 1), jnp.float32)] * 2,
        interpret=_interpret(),
    )(*ins, m, ns)

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
    a_specs, mvec = _common_specs(M, D, block_k)
    da = pl.pallas_call(
        functools.partial(_bwd_kernel, temperature=temperature),
        grid=(nj,),
        in_specs=a_specs + [mvec] * 4,
        out_specs=pl.BlockSpec((M, D), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
        interpret=_interpret(),
    )(
        a_f, a_l.reshape(M, 1), c_fp,
        _rep8(c_lp, nj, block_k), _rep8(c_vp.astype(jnp.int32), nj, block_k),
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
