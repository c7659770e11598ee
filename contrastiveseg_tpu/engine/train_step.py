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
    grad_accum_steps: int = 1,
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

    ``grad_accum_steps`` (beyond-parity; the reference scales batch only
    by adding GPUs) splits the batch into that many microbatches and
    lax.scan's the forward/backward, applying the MEAN gradient once —
    activation memory scales with the microbatch, so one v5e chip can
    train effective batch sizes that OOM as a single program (bench notes:
    batch 16 OOMs).  Semantics mirror reference multi-GPU DDP: the loss
    is a mean of per-microbatch means (= per-rank means under DDP), every
    microbatch's contrast negatives come from the step-initial queue
    (= the pre-step per-rank replica), enqueues chain sequentially, and
    BN stats chain micro-to-micro (an EMA over microbatches rather than
    one full-batch estimate — same divergence DDP's unsynced per-rank
    momentum updates have).  The optimizer step, LR schedule, warmup gate,
    and EMA key-encoder update all fire once per call, exactly like the
    B-sized single-program step.
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

    def train_step_accum(state: TrainState, batch: dict):
        """Microbatched variant (grad_accum_steps > 1); see the factory
        docstring for the exact semantics vs the single-program step."""
        rng, r_step = jax.random.split(state.rng)
        images, labels = batch["image"], batch["label"]
        with_embed = state.step >= warmup_iters
        A = grad_accum_steps
        B = images.shape[0]
        if B % A != 0:
            raise ValueError(
                f"batch size {B} not divisible by grad_accum_steps {A}"
            )
        imgs = images.reshape(A, B // A, *images.shape[1:])
        labs = labels.reshape(A, B // A, *labels.shape[1:])
        micro_keys = jax.random.split(r_step, 3 * A).reshape(A, 3)

        # EMA key-encoder update fires ONCE per optimizer step (MoCo order:
        # update, then encode keys) — every microbatch's keys come from the
        # same post-update encoder.
        new_key_params = state.key_params
        key_fwd_params = None
        if momentum_encoder and state.key_params is not None:
            m = encoder_momentum
            new_key_params = jax.tree.map(
                lambda k, q: k * m + q * (1.0 - m),
                state.key_params, state.params)
            key_fwd_params = new_key_params

        def loss_of(params, bs, img, lab, r_drop, r_sample):
            variables = {"params": params}
            if bs:
                variables["batch_stats"] = bs
            out, mut = model.apply(
                variables, img, train=train_flag,
                mutable=["batch_stats"], rngs={"dropout": r_drop},
            )
            # Negatives come from the STEP-INITIAL bank for every
            # microbatch (what each DDP rank sees pre-step).
            loss, metrics = loss_fn(
                r_sample, out, lab, with_embed, state.bank
            )
            return loss, (mut.get("batch_stats", {}), metrics, out)

        def body(carry, xs):
            bs, bank, gacc = carry
            img, lab, ks = xs
            r_drop, r_sample, r_queue = ks[0], ks[1], ks[2]
            grads, (new_bs, metrics, out) = jax.grad(
                loss_of, has_aux=True
            )(state.params, bs, img, lab, r_drop, r_sample)
            new_bank = bank
            if bank is not None:
                keys_e = jax.lax.stop_gradient(out["embed"])
                if key_fwd_params is not None:
                    kvars = {"params": key_fwd_params}
                    if bs:
                        kvars["batch_stats"] = bs
                    kout, _ = model.apply(
                        kvars, img, train=train_flag,
                        mutable=["batch_stats"], rngs={"dropout": r_drop})
                    keys_e = jax.lax.stop_gradient(kout["embed"])
                b = keys_e.shape[0]
                lab_s = subsample_stride(lab, network_stride)
                lab_s = lab_s[:, : keys_e.shape[1], : keys_e.shape[2]]
                new_bank = enqueue(
                    bank, r_queue,
                    keys_e.reshape(b, -1, keys_e.shape[-1]),
                    lab_s.reshape(b, -1),
                    pixel_update_freq=pixel_update_freq,
                    include_class0=queue_include_class0,
                    exact_sampling=exact_sampling,
                )
            gacc = jax.tree.map(jnp.add, gacc, grads)
            return (new_bs, new_bank, gacc), metrics

        gzero = jax.tree.map(jnp.zeros_like, state.params)
        (final_bs, final_bank, gsum), metrics_stack = jax.lax.scan(
            body, (state.batch_stats, state.bank, gzero),
            (imgs, labs, micro_keys),
        )
        grads = jax.tree.map(lambda g: g / A, gsum)
        metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics_stack)
        new_state = state.apply_gradients(
            grads, batch_stats=final_bs, bank=final_bank, rng=rng,
            key_params=new_key_params,
        )
        return new_state, metrics

    fn = train_step_accum if grad_accum_steps > 1 else train_step
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model):
    """Forward-only step returning stride-level logits dict."""

    def eval_step(params, batch_stats, images):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, images, train=False)

    return jax.jit(eval_step)
