"""The jitted train/eval steps — the core of the framework.

One pure function replaces the reference's Trainer.__train inner loop
(/root/reference/segmentor/trainer_contrastive.py:177-303): forward, loss
(with warmup-gated contrast term), backward, optimizer update, and the
memory-bank enqueue — all inside a single XLA program.  Under a device mesh
the same function is jitted with sharded inputs (parallel/mesh.py); BN
stats, gradients, and queue updates become global collectives
automatically.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from contrastiveseg_tpu.engine.state import TrainState
from contrastiveseg_tpu.ops.resize import subsample_stride
from contrastiveseg_tpu.ops.queue import enqueue


def make_train_step(
    model,
    loss_fn: Callable,
    warmup_iters: int = 0,
    network_stride: int = 4,
    pixel_update_freq: int = 10,
    queue_include_class0: bool = True,
    donate: bool = True,
    exact_sampling: bool = False,
    freeze_bn: bool = False,
    momentum_encoder: bool = False,
    encoder_momentum: float = 0.999,
):
    """Build the jitted train step.

    loss_fn signature: (key, outputs, targets, with_embed, bank) ->
    (loss, metrics).  `warmup_iters` gates the contrast term exactly like
    the reference (`with_embed = iters >= warmup_iters`,
    trainer_contrastive.py:209).  ``freeze_bn`` reproduces
    ModuleRunner.freeze_bn (module_runner.py:228-236): BN layers normalize
    with frozen running averages and stop updating stats (dropout and all
    parameter gradients stay live), for the --finetune flow.

    ``momentum_encoder`` enables MoCo-style keys: an EMA copy of the
    params (state.key_params, momentum ``encoder_momentum``) runs a
    second, gradient-free forward and the BANK is fed its embeddings
    instead of q.detach().  The reference sketches exactly this
    (HRNet_W48_MEM.encoder_k stub + _momentum_update_key_encoder,
    nets/hrnet.py:173-176) but never instantiates encoder_k, so its
    published runs use q.detach(); off by default for parity.
    """
    train_flag = "freeze_bn" if freeze_bn else True

    def train_step(state: TrainState, batch: dict):
        rng, r_drop, r_sample, r_queue = jax.random.split(state.rng, 4)
        images, labels = batch["image"], batch["label"]
        with_embed = state.step >= warmup_iters

        def loss_of(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, mut = model.apply(
                variables,
                images,
                train=train_flag,
                mutable=["batch_stats"],
                rngs={"dropout": r_drop},
            )
            loss, metrics = loss_fn(
                r_sample, out, labels, with_embed, state.bank
            )
            return loss, (mut.get("batch_stats", {}), metrics, out)

        grads, (new_bs, metrics, out) = jax.grad(loss_of, has_aux=True)(
            state.params
        )

        new_key_params = state.key_params
        new_bank = state.bank
        if state.bank is not None:
            # Reference _dequeue_and_enqueue (trainer_contrastive.py:102-138):
            # keys are the detached embeddings, labels strided (not interp'd).
            keys = jax.lax.stop_gradient(out["embed"])
            if momentum_encoder and state.key_params is not None:
                # EMA update from the current query weights (pre-step, MoCo
                # order: update_key_encoder -> encode keys), then a
                # gradient-free key forward.  Batch stats are read, not
                # mutated (the query forward owns them).
                m = encoder_momentum
                new_key_params = jax.tree.map(
                    lambda k, q: k * m + q * (1.0 - m),
                    state.key_params, state.params)
                kvars = {"params": new_key_params}
                if state.batch_stats:
                    kvars["batch_stats"] = state.batch_stats
                kout, _ = model.apply(
                    kvars, images, train=train_flag,
                    mutable=["batch_stats"], rngs={"dropout": r_drop})
                keys = jax.lax.stop_gradient(kout["embed"])
            B = keys.shape[0]
            lab_s = subsample_stride(labels, network_stride)
            # Guard shape mismatch from odd sizes.
            lab_s = lab_s[:, : keys.shape[1], : keys.shape[2]]
            new_bank = enqueue(
                state.bank,
                r_queue,
                keys.reshape(B, -1, keys.shape[-1]),
                lab_s.reshape(B, -1),
                pixel_update_freq=pixel_update_freq,
                include_class0=queue_include_class0,
                exact_sampling=exact_sampling,
            )

        new_state = state.apply_gradients(
            grads, batch_stats=new_bs, bank=new_bank, rng=rng,
            key_params=new_key_params,
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model):
    """Forward-only step returning stride-level logits dict."""

    def eval_step(params, batch_stats, images):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, images, train=False)

    return jax.jit(eval_step)
