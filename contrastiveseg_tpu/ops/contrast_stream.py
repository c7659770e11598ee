"""Streaming InfoNCE against a large (HBM-resident) contrast set.

The mem-variant similarity matrix is [max_samples, C*2*memory_size] =
[1024, 190k] for the published config — 0.8 GB of logits if materialized
(which is exactly what the reference does on GPU,
loss_contrast_mem.py:128-152).  This implementation never materializes it:

  * forward = two scans over contrast chunks: (1) online max + negative
    log-sum-exp accumulation with rescaling, (2) positive log-prob sum
    given the final max/neg-sum — the same two-pass structure a fused
    Pallas kernel uses, expressed as lax.scan so XLA pipelines the chunked
    matmuls through VMEM;
  * backward recomputes each chunk's logits and contracts the analytic
    d/dlogits against the contrast block, yielding dA without ever storing
    the full matrix.  The queue is training-state (stop-gradient keys), so
    dC is identically zero.

Matches ops/contrast.py::contrastive_loss (queue path, no self-exclusion)
to float tolerance; equivalence is tested in tests/test_contrast_stream.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _pad_to(x: jnp.ndarray, n: int, value) -> jnp.ndarray:
    pad = n - x.shape[0]
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def streaming_contrastive_loss(
    a_f: jnp.ndarray,  # [M, D] anchors (fp32, normalized)
    a_l: jnp.ndarray,  # [M] int32
    a_v: jnp.ndarray,  # [M] bool
    c_f: jnp.ndarray,  # [K, D] contrast set (stop-gradient state)
    c_l: jnp.ndarray,  # [K] int32
    c_v: jnp.ndarray,  # [K] bool
    temperature: float,
    base_temperature: float,
    chunk: int = 8192,
) -> jnp.ndarray:
    loss, _ = _fwd(a_f, a_l, a_v, c_f, c_l, c_v, temperature,
                   base_temperature, chunk)
    return loss


class _Residuals(NamedTuple):
    a_f: jnp.ndarray
    a_l: jnp.ndarray
    a_v: jnp.ndarray
    c_f: jnp.ndarray
    c_l: jnp.ndarray
    c_v: jnp.ndarray
    m: jnp.ndarray  # [M] row max
    ns: jnp.ndarray  # [M] negative exp sum (shifted)
    T: jnp.ndarray  # [M] sum over pos of 1/(e_ij + ns)
    P: jnp.ndarray  # [M] positive counts
    R: jnp.ndarray  # scalar: rows contributing


def _chunks(c_f, c_l, c_v, chunk):
    K = c_f.shape[0]
    n_chunks = -(-K // chunk)
    Kp = n_chunks * chunk
    c_f = _pad_to(c_f, Kp, 0.0).reshape(n_chunks, chunk, -1)
    c_l = _pad_to(c_l, Kp, -1).reshape(n_chunks, chunk)
    c_v = _pad_to(c_v, Kp, False).reshape(n_chunks, chunk)
    return c_f, c_l, c_v


def _logits_block(a_f, cf, temperature):
    return (
        jnp.dot(a_f, cf.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        / temperature
    )


def _fwd(a_f, a_l, a_v, c_f, c_l, c_v, temperature, base_temperature, chunk):
    M = a_f.shape[0]
    cfc, clc, cvc = _chunks(c_f, c_l, c_v, chunk)

    # ---- pass 1: online row-max + rescaled negative sum + positive count.
    def pass1(carry, blk):
        m, ns, P = carry
        cf, cl, cv = blk
        logits = _logits_block(a_f, cf, temperature)  # [M, chunk]
        same = a_l[:, None] == cl[None, :]
        ok = cv[None, :]
        masked = jnp.where(ok, logits, _NEG_INF)
        new_m = jnp.maximum(m, jnp.max(masked, axis=1))
        scale = jnp.exp(m - new_m)
        e = jnp.where(ok, jnp.exp(logits - new_m[:, None]), 0.0)
        ns = ns * scale + jnp.sum(jnp.where(~same & ok, e, 0.0), axis=1)
        P = P + jnp.sum(same & ok, axis=1)
        return (new_m, ns, P), None

    init = (
        jnp.full((M,), _NEG_INF, jnp.float32),
        jnp.zeros((M,), jnp.float32),
        jnp.zeros((M,), jnp.int32),
    )
    (m, ns, P), _ = jax.lax.scan(pass1, init, (cfc, clc, cvc))

    # ---- pass 2: positive log-prob sum + T accumulator for backward.
    def pass2(carry, blk):
        S1, T = carry
        cf, cl, cv = blk
        logits = _logits_block(a_f, cf, temperature)
        same = a_l[:, None] == cl[None, :]
        ok = cv[None, :]
        pos = same & ok
        sh = logits - m[:, None]
        e = jnp.exp(sh)
        denom = e + ns[:, None]
        S1 = S1 + jnp.sum(jnp.where(pos, sh - jnp.log(denom + 1e-30), 0.0), axis=1)
        T = T + jnp.sum(jnp.where(pos, 1.0 / (denom + 1e-30), 0.0), axis=1)
        return (S1, T), None

    (S1, T), _ = jax.lax.scan(
        pass2, (jnp.zeros((M,), jnp.float32), jnp.zeros((M,), jnp.float32)),
        (cfc, clc, cvc),
    )

    row_ok = a_v & (P > 0)
    R = jnp.maximum(jnp.sum(row_ok), 1)
    per_row = -(temperature / base_temperature) * S1 / jnp.maximum(P, 1)
    loss = jnp.sum(jnp.where(row_ok, per_row, 0.0)) / R
    res = _Residuals(a_f, a_l, a_v, c_f, c_l, c_v, m, ns, T, P, R)
    return loss, res


def _bwd(temperature, base_temperature, chunk, res: _Residuals, g):
    a_f, a_l, a_v, c_f, c_l, c_v, m, ns, T, P, R = res
    M, D = a_f.shape
    cfc, clc, cvc = _chunks(c_f, c_l, c_v, chunk)

    row_ok = a_v & (P > 0)
    # w_i = g * -(t/bt) / (R * P_i) for contributing rows.
    w = jnp.where(
        row_ok,
        g * (-(temperature / base_temperature)) / (R * jnp.maximum(P, 1)),
        0.0,
    )

    def bwd_chunk(dA, blk):
        cf, cl, cv = blk
        logits = _logits_block(a_f, cf, temperature)
        same = a_l[:, None] == cl[None, :]
        ok = cv[None, :]
        pos = same & ok
        neg = (~same) & ok
        e = jnp.exp(logits - m[:, None])
        denom = e + ns[:, None] + 1e-30
        dlogit = jnp.where(pos, w[:, None] * (1.0 - e / denom), 0.0)
        dlogit = dlogit + jnp.where(neg, -w[:, None] * T[:, None] * e, 0.0)
        dA = dA + jnp.dot(
            dlogit / temperature, cf, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return dA, None

    dA, _ = jax.lax.scan(bwd_chunk, jnp.zeros((M, D), jnp.float32),
                         (cfc, clc, cvc))
    zeros_c = jnp.zeros_like(c_f)
    return (
        dA,
        jnp.zeros_like(a_l),
        jnp.zeros_like(a_v),
        zeros_c,  # queue is stop-gradient state; exact dC is never consumed
        jnp.zeros_like(c_l),
        jnp.zeros_like(c_v),
    )


def _fwd_vjp(a_f, a_l, a_v, c_f, c_l, c_v, temperature, base_temperature, chunk):
    return _fwd(a_f, a_l, a_v, c_f, c_l, c_v, temperature, base_temperature,
                chunk)


streaming_contrastive_loss.defvjp(_fwd_vjp, _bwd)
