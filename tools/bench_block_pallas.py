#!/usr/bin/env python
"""Micro-benchmark: fused inference BasicBlock kernel vs XLA eval lowering.

Measures ops/block_pallas.fused_basic_block_eval against the plain XLA
formulation of relu(conv2(relu(conv1(x)*s1+b1))*s2+b2+x) at the HRNet
stride-4 branch shape ([8, 128, 256, 48] bf16 by default).  Per the
axon-relay measurement rules, each timed call chains N UNROLLED block
applications inside one jit and a value is device_get'ed.

Usage: python tools/bench_block_pallas.py [--chain 8] [--reps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--channels", type=int, default=48)
    ap.add_argument("--chain", type=int, default=8,
                    help="blocks chained per jit call (amortizes relay "
                         "dispatch)")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from contrastiveseg_tpu.ops.block_pallas import (
        fused_basic_block_eval,
        reference_block_eval,
    )

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    rng = np.random.default_rng(0)
    B, H, W, C = args.batch, args.height, args.width, args.channels
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
    s1 = jnp.asarray(rng.uniform(0.9, 1.1, C), jnp.float32)
    s2 = jnp.asarray(rng.uniform(0.9, 1.1, C), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(C) * 0.01, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(C) * 0.01, jnp.float32)

    def chain(fn):
        def run(x):
            for _ in range(args.chain):
                x = fn(x, w1, s1, b1, w2, s2, b2)
            return x
        return jax.jit(run)

    fused = chain(lambda *a: fused_basic_block_eval(*a))
    xla = chain(reference_block_eval)
    noop = jax.jit(lambda x: x * 1.0)

    def timed(fn, label):
        y = fn(x)
        float(jax.device_get(y.reshape(-1)[0]))  # compile + warm
        t0 = time.time()
        for _ in range(args.reps):
            y = fn(x)
        float(jax.device_get(y.reshape(-1)[0]))
        return (time.time() - t0) / args.reps

    t_noop = timed(noop, "noop")
    t_fused = timed(fused, "fused")
    t_xla = timed(xla, "xla")

    # 2 convs x 2*9*C*C flops per output element.
    flops = args.chain * 2 * (2 * 9 * C * C) * B * H * W
    per_fused = (t_fused - t_noop) / args.chain
    per_xla = (t_xla - t_noop) / args.chain
    print(json.dumps({
        "shape": [B, H, W, C],
        "dtype": str(dtype.__name__),
        "block_us_fused": round(per_fused * 1e6, 1),
        "block_us_xla": round(per_xla * 1e6, 1),
        "tflops_fused": round(flops / args.chain / per_fused / 1e12, 1),
        "tflops_xla": round(flops / args.chain / per_xla / 1e12, 1),
        "speedup": round(per_xla / per_fused, 3),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
