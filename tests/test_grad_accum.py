"""Gradient accumulation (solver.grad_accum_steps) — beyond-parity.

The reference scales batch size only by adding GPUs (DDP, one microbatch
per rank); ``grad_accum_steps`` gives the same mean-of-per-microbatch-means
semantics on one chip via a lax.scan over microbatches (bench notes: batch
16 OOMs on v5e as a single program).  Two proofs:

1. Exact equivalence: with BN frozen (deterministic normalization) and the
   contrast term warmup-gated off, the A=2 microbatched step must produce
   the SAME updated params as the single-program step on the same batch —
   mean-of-means == full-batch mean when microbatches are equal-sized and
   every pixel is valid.
2. The full mem-contrast path (live BN, bank enqueue, live contrast term)
   runs under accumulation: step advances once, queue pointers advance,
   loss finite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveseg_tpu.engine.optim import build_optimizer
from contrastiveseg_tpu.engine.state import TrainState
from contrastiveseg_tpu.engine.train_step import make_train_step
from contrastiveseg_tpu.losses.manager import build_loss
from contrastiveseg_tpu.models.nets import build_model
from contrastiveseg_tpu.ops.queue import init_memory_bank
from contrastiveseg_tpu.presets import get_preset

H, W, B = 32, 64, 4


def _make_state(cfg, model, with_memory: bool):
    rng = jax.random.key(7)
    k_params, k_drop, k_bank, k_state = jax.random.split(rng, 4)
    variables = model.init(
        {"params": k_params, "dropout": k_drop},
        jnp.zeros((1, H, W, 3), jnp.float32),
        train=True,
    )
    tx = build_optimizer(cfg, variables["params"])
    bank = None
    if with_memory:
        bank = init_memory_bank(
            k_bank, cfg.get("data.num_classes"),
            cfg.get("contrast.memory_size"), cfg.get("contrast.proj_dim"),
        )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        bank=bank,
        rng=k_state,
        tx=tx,
    )


def _batch():
    r = np.random.default_rng(11)
    return {
        "image": jnp.asarray(
            r.standard_normal((B, H, W, 3)).astype(np.float32)),
        "label": jnp.asarray(
            r.integers(0, 5, size=(B, H, W)).astype(np.int32)),
    }


def test_accum_matches_fullbatch_step():
    cfg = get_preset("smoke_hrnet_w18")
    cfg = cfg.updated("contrast.with_memory", False)
    cfg = cfg.updated("loss.loss_type", "contrast_ce_loss")
    # Dropout draws a fresh mask per microbatch under the accum scan
    # (train_step.py folds the step rng per microbatch), so the exact
    # mean-of-means == full-mean identity only holds with dropout off.
    cfg = cfg.updated("network.head_dropout", 0.0)
    model = build_model(cfg)
    loss_fn = build_loss(cfg)
    batch = _batch()

    kw = dict(
        warmup_iters=10_000,  # contrast gated off: its rng differs per micro
        network_stride=cfg.get("network.stride"),
        donate=False,
        freeze_bn=True,  # deterministic normalization across microbatches
    )
    step_full = make_train_step(model, loss_fn, grad_accum_steps=1, **kw)
    step_accum = make_train_step(model, loss_fn, grad_accum_steps=2, **kw)

    s0 = _make_state(cfg, model, with_memory=False)
    # Conditioning: freezing BN at its INIT stats (mean 0 / var 1) lets
    # activations blow up ~100x by stage4 (measured |logit| 117, CE 58.7)
    # — there, fp32 reduction-order noise in the conv wgrads reaches 1e-2
    # relative and the exact mean-of-means identity drowns in it (it even
    # varies with the XLA CPU thread partition, i.e. with the 8-virtual-
    # device test env).  Warm the running stats with a few train-mode
    # forwards first so the frozen net operates at |logit| ~ 1.5 like any
    # real finetune would; the identity then holds to ~5e-6 in the grads.
    bs = s0.batch_stats
    for _ in range(3):
        _, mut = model.apply(
            {"params": s0.params, "batch_stats": bs},
            batch["image"], train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        bs = mut["batch_stats"]
    s0 = s0.replace(batch_stats=bs)

    s_full, m_full = step_full(s0, batch)
    s_acc, m_acc = step_accum(s0, batch)

    np.testing.assert_allclose(
        float(m_full["loss_seg"]), float(m_acc["loss_seg"]),
        rtol=1e-5, err_msg="seg loss diverged (mean-of-means != full mean)")
    assert int(s_acc.step) == 1
    flat_f, _ = jax.tree_util.tree_flatten_with_path(s_full.params)
    flat_a, _ = jax.tree_util.tree_flatten_with_path(s_acc.params)
    # Grad residual measured 5.6e-6 max abs (well-conditioned regime), so
    # params differ by <= lr * that ~ 6e-8; atol 1e-5 gives margin while a
    # wrong mean (missing /A) still fails by orders of magnitude.
    for (path, a), (_, b) in zip(flat_f, flat_a):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5,
            err_msg=f"param {jax.tree_util.keystr(path)} diverged")


def test_accum_full_mem_contrast_path():
    cfg = get_preset("smoke_hrnet_w18")  # mem loss, warmup 0, bank on
    model = build_model(cfg)
    loss_fn = build_loss(cfg)
    step = make_train_step(
        model, loss_fn,
        warmup_iters=0,
        network_stride=cfg.get("network.stride"),
        pixel_update_freq=cfg.get("contrast.pixel_update_freq", default=10),
        donate=False,
        grad_accum_steps=2,
    )
    s0 = _make_state(cfg, model, with_memory=True)
    ptr0 = int(np.asarray(s0.bank.segment_ptr).sum())
    s1, metrics = step(s0, _batch())
    assert int(s1.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert int(np.asarray(s1.bank.segment_ptr).sum()) > ptr0, (
        "bank did not enqueue under accumulation")


def test_accum_rejects_indivisible_batch():
    cfg = get_preset("smoke_hrnet_w18")
    cfg = cfg.updated("contrast.with_memory", False)
    cfg = cfg.updated("loss.loss_type", "contrast_ce_loss")
    model = build_model(cfg)
    loss_fn = build_loss(cfg)
    step = make_train_step(
        model, loss_fn, donate=False, grad_accum_steps=3,
        network_stride=cfg.get("network.stride"),
    )
    s0 = _make_state(cfg, model, with_memory=False)
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        step(s0, _batch())  # B=4 not divisible by 3
