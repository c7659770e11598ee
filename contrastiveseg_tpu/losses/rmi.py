"""Region Mutual Information loss (pure JAX).

Re-implements RMILoss (/root/reference/lib/loss/rmi_loss.py:200-402):
BCE term + a lower bound of the region mutual information between the
one-hot label map and the sigmoid probability map, computed from 3x3
(radius^2) neighborhood covariance log-determinants.

Math kept exactly (map_get_pairs neighbor stacking :31-73, covariance /
Schur-complement / Cholesky log-det lower bound :327-402).  Divergence: the
reference promotes covariances to float64; with x64 disabled we stay in
fp32 — the matrices are [half_d, half_d] with half_d<=100 and are
regularized by _POS_ALPHA, so fp32 Cholesky is stable in practice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CLIP_MIN = 1e-6
_POS_ALPHA = 1e-3


def _map_get_pairs(labels, probs, radius):
    """[N, H, W, C] -> two [N, C, r*r, (H-r+1)*(W-r+1)] stacks."""
    n, h, w, c = labels.shape
    nh, nw = h - (radius - 1), w - (radius - 1)
    la, pr = [], []
    for y in range(radius):
        for x in range(radius):
            la.append(labels[:, y:y + nh, x:x + nw, :])
            pr.append(probs[:, y:y + nh, x:x + nw, :])
    la = jnp.stack(la, axis=1)  # [N, r*r, nh, nw, C]
    pr = jnp.stack(pr, axis=1)
    la = la.transpose(0, 4, 1, 2, 3).reshape(n, c, radius * radius, nh * nw)
    pr = pr.transpose(0, 4, 1, 2, 3).reshape(n, c, radius * radius, nh * nw)
    return la, pr


def _log_det_cholesky(mat):
    """log det via Cholesky: 2*sum(log(diag(chol)))."""
    chol = jnp.linalg.cholesky(mat)
    return 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1) + 1e-8), axis=-1
    )


def rmi_lower_bound(onehot, probs, radius=3, pool_size=3, pool_stride=3,
                    pool_way=0):
    """onehot/probs: [N, H, W, C] -> scalar lower bound (summed classes)."""
    if pool_stride > 1:
        pad = pool_size // 2
        window = (1, pool_size, pool_size, 1)
        strides = (1, pool_stride, pool_stride, 1)
        padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
        if pool_way == 0:  # max pool
            onehot = jax.lax.reduce_window(
                onehot, -jnp.inf, jax.lax.max, window, strides, padding
            )
            probs = jax.lax.reduce_window(
                probs, -jnp.inf, jax.lax.max, window, strides, padding
            )
        elif pool_way == 1:  # avg pool
            ones = jnp.ones_like(onehot)
            cnt = jax.lax.reduce_window(
                ones, 0.0, jax.lax.add, window, strides, padding
            )
            onehot = jax.lax.reduce_window(
                onehot, 0.0, jax.lax.add, window, strides, padding
            ) / cnt
            probs = jax.lax.reduce_window(
                probs, 0.0, jax.lax.add, window, strides, padding
            ) / cnt
        else:
            raise NotImplementedError(f"rmi_pool_way {pool_way}")

    n, h, w, c = onehot.shape
    half_d = radius * radius
    la, pr = _map_get_pairs(onehot, probs, radius)  # [N, C, d, P]

    la = la - jnp.mean(la, axis=-1, keepdims=True)
    pr = pr - jnp.mean(pr, axis=-1, keepdims=True)
    hp = jax.lax.Precision.HIGHEST
    la_cov = jnp.matmul(la, la.transpose(0, 1, 3, 2), precision=hp)
    pr_cov = jnp.matmul(pr, pr.transpose(0, 1, 3, 2), precision=hp)
    eye = jnp.eye(half_d)
    pr_cov_inv = jnp.linalg.inv(pr_cov + eye * _POS_ALPHA)
    la_pr_cov = jnp.matmul(la, pr.transpose(0, 1, 3, 2), precision=hp)
    appro_var = la_cov - jnp.matmul(
        jnp.matmul(la_pr_cov, pr_cov_inv, precision=hp),
        la_pr_cov.transpose(0, 1, 3, 2), precision=hp,
    )
    rmi_now = 0.5 * _log_det_cholesky(appro_var + eye * _POS_ALPHA)  # [N, C]
    rmi_per_class = jnp.mean(rmi_now, axis=0) / float(half_d)  # [C]
    return jnp.sum(rmi_per_class)


def rmi_loss(
    logits: jnp.ndarray,  # [N, H, W, C]
    labels: jnp.ndarray,  # [N, H, W] int, ignore < 0 or >= C
    num_classes: int,
    radius: int = 3,
    pool_size: int = 3,
    pool_stride: int = 3,
    pool_way: int = 0,
    weight_lambda: float = 0.5,
    lambda_way: int = 1,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """forward_sigmoid path (rmi_loss.py:287-325): masked BCE + RMI bound."""
    valid = (labels >= 0) & (labels < num_classes)
    safe = jnp.clip(labels, 0, num_classes - 1)
    onehot = jax.nn.one_hot(safe, num_classes) * valid[..., None]

    logits = logits.astype(jnp.float32)
    # Masked sigmoid BCE, sum / (valid_pixels + 1).
    bce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    bce = jnp.sum(bce * valid[..., None])
    bce_loss = bce / (jnp.sum(valid) + 1.0)

    probs = jax.nn.sigmoid(logits) * valid[..., None] + _CLIP_MIN
    rmi = rmi_lower_bound(onehot, probs, radius, pool_size, pool_stride,
                          pool_way)
    if lambda_way:
        final = weight_lambda * bce_loss + rmi * (1.0 - weight_lambda)
    else:
        final = bce_loss + rmi * weight_lambda
    return loss_weight * final
