"""SWA BN re-estimation == torchcontrib bn_update semantics — VERDICT r3 #9.

torchcontrib's bn_update resets BN running stats and runs a full pass with
``momentum=None``, i.e. torch's cumulative moving average — the running
stats end up the PLAIN AVERAGE of per-batch statistics.  Two proofs:

1. mechanism parity: torch ``BatchNorm2d(momentum=None)`` over K batches
   vs our recover-and-average formula applied to flax BN updates on the
   SAME data produce the same running mean, and the same running var up
   to torch's Bessel correction (torch stores the unbiased batch var,
   n/(n-1) * biased — a framework convention, not SWA semantics);
2. Trainer._reestimate_bn equals the brute-force per-batch average of the
   model's own batch statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from contrastiveseg_tpu.presets import get_preset


def test_mechanism_matches_torch_momentum_none():
    from contrastiveseg_tpu.models.layers import BN_MOMENTUM

    rng = np.random.default_rng(3)
    C, K = 5, 4
    batches = [rng.standard_normal((2, 6, 7, C)).astype(np.float32) * (i + 1)
               for i in range(K)]

    # torchcontrib bn_update mechanism: momentum=None cumulative average.
    bn = torch.nn.BatchNorm2d(C, momentum=None)
    bn.train()
    with torch.no_grad():
        for b in batches:
            bn(torch.from_numpy(b).permute(0, 3, 1, 2))

    # Our mechanism: flax-style EMA recovery + uniform average.
    m = BN_MOMENTUM
    mean = np.zeros(C)
    var = np.ones(C)
    avg_mean = avg_var = None
    for i, b in enumerate(batches):
        bmean = b.reshape(-1, C).mean(0)
        bvar = b.reshape(-1, C).var(0)  # biased, the flax batch statistic
        new_mean = m * mean + (1 - m) * bmean
        new_var = m * var + (1 - m) * bvar
        rec_mean = (new_mean - m * mean) / (1 - m)
        rec_var = (new_var - m * var) / (1 - m)
        if avg_mean is None:
            avg_mean, avg_var = rec_mean, rec_var
        else:
            avg_mean = avg_mean * (i / (i + 1)) + rec_mean / (i + 1)
            avg_var = avg_var * (i / (i + 1)) + rec_var / (i + 1)

    n = batches[0].reshape(-1, C).shape[0]
    np.testing.assert_allclose(
        bn.running_mean.numpy(), avg_mean, rtol=1e-5, atol=1e-6)
    # torch stores the UNBIASED batch var; scale our biased average.
    np.testing.assert_allclose(
        bn.running_var.numpy(), avg_var * n / (n - 1), rtol=1e-5, atol=1e-6)


def test_reestimate_bn_is_exact_batch_average(tmp_path):
    from contrastiveseg_tpu.engine.trainer import Trainer
    from contrastiveseg_tpu.models.layers import BN_MOMENTUM

    cfg = get_preset("smoke_hrnet_w18")
    cfg = cfg.updated("data.synthetic_size", [32, 64])
    cfg = cfg.updated("train.data_transformer.input_size", [64, 32])
    cfg = cfg.updated("checkpoints.checkpoints_dir", str(tmp_path / "swa"))
    t = Trainer(cfg, use_mesh=False)

    rng = np.random.default_rng(11)
    K = 3
    batches = [
        {"image": jnp.asarray(
            rng.standard_normal((2, 32, 64, 3)).astype(np.float32))}
        for _ in range(K)
    ]

    base = t.state.batch_stats
    t._reestimate_bn(iter(batches), num_batches=K)

    # Brute force: per-batch stats recovered from fresh EMA updates off the
    # SAME base, averaged uniformly.
    m = BN_MOMENTUM

    # Mirror the trainer's jitted program exactly (apply + recovery inside
    # one jit): XLA compiles identical jaxprs identically, so the per-batch
    # stats below are bit-equal to the trainer's — unlike an eager forward,
    # whose op-by-op execution reassociates the E[x^2]-E[x]^2 variance
    # cancellation in deep layers by up to ~1e-3 vs the fused program.
    @jax.jit
    def batch_stat(params, base_stats, img):
        _, mut = t.model.apply(
            {"params": params, "batch_stats": base_stats},
            img, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return jax.tree.map(
            lambda new, old: (new - m * old) / (1.0 - m),
            mut["batch_stats"], base_stats)

    stats = [jax.device_get(batch_stat(t.state.params, base, b["image"]))
             for b in batches]
    expected = jax.tree.map(lambda *xs: np.mean(xs, axis=0), *stats)

    flat_got = jax.tree_util.tree_leaves(jax.device_get(t.state.batch_stats))
    flat_exp = jax.tree_util.tree_leaves(expected)
    assert len(flat_got) == len(flat_exp) > 0
    # The per-batch stats are bit-equal (same jitted program); the only
    # residual is the trainer's incremental on-device average vs np.mean —
    # plain fp32 rounding, no amplification.
    for g, e in zip(flat_got, flat_exp):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                   rtol=1e-5, atol=1e-6)
