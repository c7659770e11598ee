"""Alternative normalizations: Switchable Norm, FRN, GroupNorm dispatch.

Reference: lib/extensions/switchablenorms/switchable_norm.py (218 LoC) and
frn.py (33 LoC) — pure-Python there too; and ModuleHelper's bn_type
dispatch (lib/models/tools/module_helper.py:28-121).  Under the mesh,
"syncbn" is the plain BatchNorm (global-batch stats by construction).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class FRN(nn.Module):
    """Filter Response Normalization + TLU threshold."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        tau = self.param("tau", nn.initializers.zeros, (c,))
        nu2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2),
                       keepdims=True)
        y = x * (nu2 + self.epsilon) ** -0.5
        return jnp.maximum(gamma * y + beta, tau).astype(x.dtype)


class SwitchableNorm(nn.Module):
    """Learned softmax mixture of Instance/Layer/Batch statistics."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        c = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean_in = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var_in = jnp.var(xf, axis=(1, 2), keepdims=True)
        mean_ln = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var_ln = jnp.var(xf, axis=(1, 2, 3), keepdims=True)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((1, 1, 1, c))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((1, 1, 1, c))
        )
        if train is True:  # "freeze_bn" sentinel uses running stats
            mean_bn = jnp.mean(xf, axis=(0, 1, 2), keepdims=True)
            var_bn = jnp.var(xf, axis=(0, 1, 2), keepdims=True)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1 - self.momentum) * mean_bn
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var_bn
                )
        else:
            mean_bn, var_bn = ra_mean.value, ra_var.value

        mw = jax_softmax(self.param("mean_weight", nn.initializers.ones, (3,)))
        vw = jax_softmax(self.param("var_weight", nn.initializers.ones, (3,)))
        mean = mw[0] * mean_in + mw[1] * mean_ln + mw[2] * mean_bn
        var = vw[0] * var_in + vw[1] * var_ln + vw[2] * var_bn

        gamma = self.param("scale", nn.initializers.ones, (c,))
        beta = self.param("bias", nn.initializers.zeros, (c,))
        y = (xf - mean) * (var + self.epsilon) ** -0.5
        return (y * gamma + beta).astype(x.dtype)


def jax_softmax(x):
    import jax

    return jax.nn.softmax(x)
