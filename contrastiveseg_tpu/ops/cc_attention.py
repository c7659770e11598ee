"""Criss-cross attention, TPU-native.

The reference ships ~350 lines of CUDA (lib/extensions/cc_attention/src/
ca.cu: `ca_weight` affinity + `ca_map` aggregation kernels, fwd+bwd).  On
TPU the same H+W-1 criss-cross attention is two einsums over the row and
column axes — XLA fuses them and autodiff provides the backward, so the
entire extension collapses to ~40 lines with identical O((H+W)*HW) cost.

Semantics (CCNet): for each pixel, attend over its row and its column,
with the self position counted once (the row pass masks the self logit
with -inf like the CUDA kernel does for the duplicated center).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def criss_cross_attention(
    query: jnp.ndarray,  # [B, H, W, Dk]
    key: jnp.ndarray,  # [B, H, W, Dk]
    value: jnp.ndarray,  # [B, H, W, Dv]
) -> jnp.ndarray:
    """Returns [B, H, W, Dv] criss-cross context."""
    B, H, W, Dk = query.shape
    hp = jnp.float32

    # Column (vertical) logits: pixel (h, w) vs all (h', w).
    col = jnp.einsum("bhwd,bkwd->bhwk", query, key,
                     preferred_element_type=hp)  # [B, H, W, H]
    # Mask the duplicated self position in the column pass (the CUDA
    # kernel assigns self to the row pass only).
    eye = jnp.eye(H, dtype=bool)[None, :, None, :]
    col = jnp.where(eye, -1e30, col)
    # Row (horizontal) logits: pixel (h, w) vs all (h, w').
    row = jnp.einsum("bhwd,bhkd->bhwk", query, key,
                     preferred_element_type=hp)  # [B, H, W, W]

    logits = jnp.concatenate([col, row], axis=-1)  # [B, H, W, H+W]
    attn = jax.nn.softmax(logits, axis=-1)
    a_col, a_row = attn[..., :H], attn[..., H:]

    out = jnp.einsum("bhwk,bkwd->bhwd", a_col.astype(value.dtype), value,
                     preferred_element_type=hp)
    out = out + jnp.einsum("bhwk,bhkd->bhwd", a_row.astype(value.dtype),
                           value, preferred_element_type=hp)
    return out.astype(value.dtype)
