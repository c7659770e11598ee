"""Analytic FLOPs accounting (reference: segmentor/tools/cost_helper.py:1-147
— per-layer conv/attention formulas) plus an exact XLA-based counter.

`xla_flops` beats the reference's hand formulas: it asks the compiler for
the cost analysis of the actual jitted program.
"""

from __future__ import annotations

from typing import Callable


def conv2d_flops(h: int, w: int, cin: int, cout: int, k: int = 3,
                 stride: int = 1, groups: int = 1) -> float:
    """MACs*2 of a conv layer (cost_helper conv formula)."""
    oh, ow = h // stride, w // stride
    return 2.0 * oh * ow * cout * (cin // groups) * k * k


def attention_flops(n: int, m: int, dim: int) -> float:
    """q@k^T + attn@v for n queries, m keys."""
    return 2.0 * n * m * dim * 2


def xla_flops(fn: Callable, *args) -> float:
    """Exact model FLOPs from the compiled program's cost analysis."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", -1.0))
