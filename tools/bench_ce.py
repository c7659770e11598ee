#!/usr/bin/env python
"""Micro-bench: upsampled_cross_entropy variants on the real chip.

Sweeps (row_block, unroll) for the blockwise align-corners-upsampled CE
(losses/ce.py) at the headline shape (batch 8, 19 classes, stride-4
128x256 logits -> 512x1024 labels, bf16 logits) and prints ms/step for
fwd and fwd+grad.

Timing rule for the axon relay (verify skill): never time single
dispatches — chain ITERS dependent copies inside ONE jit (each iteration
feeds a scalar perturbation derived from the previous loss so XLA cannot
dedupe), device_get the result, and divide.
"""

from __future__ import annotations

import argparse
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--classes", type=int, default=19)
    ap.add_argument("--hw", default="512x1024")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--grad", action="store_true", help="time value_and_grad")
    ap.add_argument("--row-blocks", default="32,64,128")
    ap.add_argument("--unrolls", default="1,2,4,8")
    ap.add_argument("--precisions", default="highest",
                    help="comma list: highest,high,default")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from contrastiveseg_tpu.losses.ce import upsampled_cross_entropy

    H, W = map(int, args.hw.split("x"))
    B, C = args.batch, args.classes
    h, w = H // 4, W // 4
    rng = np.random.default_rng(0)
    seg = jnp.asarray(rng.standard_normal((B, h, w, C)), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(-1, C, (B, H, W)), jnp.int32)

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}  shape: seg {seg.shape} bf16 -> "
          f"labels {labels.shape}", flush=True)

    def run(rb: int, un: int, prec: str) -> float:
        def one(s):
            return upsampled_cross_entropy(
                s, labels, None, -1, row_block=rb, unroll=un, precision=prec)

        if args.grad:
            def one_g(s):
                v, g = jax.value_and_grad(
                    lambda x: one(x.astype(jnp.bfloat16)))(
                        s.astype(jnp.float32))
                return v + jnp.mean(g).astype(jnp.float32)
        else:
            one_g = one

        @jax.jit
        def chain(s):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(args.iters):
                v = one_g(s + acc.astype(s.dtype) * 1e-12)
                acc = acc + v.astype(jnp.float32)
            return acc

        @jax.jit
        def noop(s):
            return jnp.sum(s[0, 0, 0]).astype(jnp.float32)

        float(jax.device_get(chain(seg)))  # compile + warm
        float(jax.device_get(noop(seg)))
        t0 = time.perf_counter()
        float(jax.device_get(chain(seg)))
        t1 = time.perf_counter()
        float(jax.device_get(noop(seg)))
        t2 = time.perf_counter()
        return ((t1 - t0) - (t2 - t1)) / args.iters * 1e3

    rbs = [int(x) for x in args.row_blocks.split(",")]
    uns = [int(x) for x in args.unrolls.split(",")]
    mode = "fwd+grad" if args.grad else "fwd"
    for prec in args.precisions.split(","):
        for rb in rbs:
            for un in uns:
                ms = run(rb, un, prec)
                print(f"prec={prec:8s} row_block={rb:4d} unroll={un:2d}  "
                      f"{ms:8.3f} ms/call ({mode})", flush=True)


if __name__ == "__main__":
    main()
