"""Trainer: the full training driver.

Re-implements the reference Trainer
(/root/reference/segmentor/trainer_contrastive.py:25-439) around one jitted
train step: build model/loss/optimizer/pipelines, loop to max_iters with
periodic display, validation, and checkpointing.  The per-iter LR step,
contrast warmup gate, and memory-bank update all live *inside* the compiled
step (engine/train_step.py); the host loop only feeds data and logs.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from contrastiveseg_tpu.data.pipeline import build_pipeline
from contrastiveseg_tpu.engine.checkpoint import CheckpointManager
from contrastiveseg_tpu.engine.optim import build_optimizer
from contrastiveseg_tpu.engine.state import create_train_state
from contrastiveseg_tpu.engine.train_step import make_train_step
from contrastiveseg_tpu.losses.manager import build_loss
from contrastiveseg_tpu.models.nets import build_model
from contrastiveseg_tpu.parallel.mesh import make_mesh, shard_batch, shard_state
from contrastiveseg_tpu.utils.logging import get_logger


class Trainer:
    def __init__(self, cfg, use_mesh: bool = True):
        self.cfg = cfg
        self.log = get_logger(
            log_file=cfg.get("logging.log_file", default=None),
            stdout_level=cfg.get("logging.stdout_level", default="info"),
        )
        self.model = build_model(cfg)
        self.loss_fn = build_loss(cfg)
        self.mesh = make_mesh() if use_mesh else None

        # Train state.
        td = cfg.get("train.data_transformer", default={})
        w, h = td.get("input_size", (1024, 512))
        batch = cfg.get("train.batch_size", default=8)
        rng = jax.random.key(cfg.get("seed", default=304))

        # Two-phase init so the optimizer can see the param tree (nbb groups).
        k_params, k_drop, k_bank, k_state = jax.random.split(rng, 4)
        import jax.numpy as jnp

        variables = self.model.init(
            {"params": k_params, "dropout": k_drop},
            jnp.zeros((1, h, w, 3), jnp.float32),
            train=True,
        )
        # Pretrained weights (torch-imported via tools/import_torch_ckpt.py;
        # reference counterpart: ModuleHelper.load_model, module_helper.py:124).
        pretrained = cfg.get("network.pretrained", default=None)
        if pretrained:
            from contrastiveseg_tpu.utils.torch_import import load_variables

            loaded = load_variables(pretrained)
            variables = dict(variables)
            for col in ("params", "batch_stats"):
                if col in loaded:
                    variables[col] = jax.tree.map(
                        lambda cur, new: jnp.asarray(new, cur.dtype),
                        variables[col], loaded[col],
                    )
            self.log.info(f"loaded pretrained weights from {pretrained}")
        tx = build_optimizer(cfg, variables["params"])
        from contrastiveseg_tpu.engine.state import TrainState
        from contrastiveseg_tpu.ops.queue import init_memory_bank

        bank = None
        if cfg.get("contrast.with_memory", default=False):
            bank = init_memory_bank(
                k_bank,
                cfg.get("data.num_classes"),
                cfg.get("contrast.memory_size", default=5000),
                cfg.get("contrast.proj_dim", default=256),
            )
            # A torch-imported HRNet_W48_MEM checkpoint carries its queue
            # buffers in a sidecar written by tools/import_torch_ckpt.py;
            # seed the bank from it so mem-training resumes coherently.
            qpath = f"{pretrained}.queues.msgpack" if pretrained else None
            if qpath and os.path.exists(qpath):
                import flax.serialization

                from contrastiveseg_tpu.ops.queue import MemoryBank

                with open(qpath, "rb") as f:
                    q = flax.serialization.msgpack_restore(f.read())
                bank = MemoryBank(
                    segment_queue=jnp.asarray(q["segment_queue"]),
                    segment_ptr=jnp.asarray(q["segment_ptr"], jnp.int32),
                    pixel_queue=jnp.asarray(q["pixel_queue"]),
                    pixel_ptr=jnp.asarray(q["pixel_ptr"], jnp.int32),
                )
                self.log.info(f"seeded memory bank from {qpath}")
        key_params = None
        if cfg.get("contrast.momentum_encoder", default=False):
            # MoCo-style EMA key encoder starts as a copy of the query.
            key_params = jax.tree.map(jnp.array, variables["params"])
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            bank=bank,
            rng=k_state,
            tx=tx,
            key_params=key_params,
        )
        if self.mesh is not None:
            self.state = shard_state(
                self.state, self.mesh,
                shard_queue=cfg.get("parallel.shard_queue", default=False),
            )

        self.train_step = make_train_step(
            self.model,
            self.loss_fn,
            warmup_iters=cfg.get("contrast.warmup_iters", default=0),
            network_stride=cfg.get("network.stride", default=4),
            pixel_update_freq=cfg.get("contrast.pixel_update_freq", default=10),
            queue_include_class0=cfg.get(
                "contrast.include_class0", default=True
            ),
            donate=cfg.get("network.donate", default=True),
            exact_sampling=cfg.get("contrast.exact_sampling", default=False),
            freeze_bn=cfg.get("network.freeze_bn", default=False),
            momentum_encoder=cfg.get(
                "contrast.momentum_encoder", default=False),
            encoder_momentum=cfg.get(
                "contrast.encoder_momentum", default=0.999),
            grad_accum_steps=cfg.get(
                "solver.grad_accum_steps", default=1),
        )
        # plateau LR: val-metric-driven scale (engine/optim.py:PlateauController).
        self.plateau = None
        if cfg.get("lr.lr_policy", default="lambda_poly") == "plateau":
            from contrastiveseg_tpu.engine.optim import PlateauController

            self.plateau = PlateauController.from_config(cfg)

        from contrastiveseg_tpu.engine.evaluator import build_evaluator

        self.evaluator = build_evaluator(
            cfg,
            self.model,
            shard_fn=(
                (lambda b: shard_batch(b, self.mesh)) if self.mesh else None
            ),
            batch_multiple=(
                self.mesh.devices.size if self.mesh is not None else 1
            ),
        )
        self._val_pipe = None  # built once, reused across validate() calls
        self.ckpt = CheckpointManager(
            cfg.get("checkpoints.checkpoints_dir", default="./checkpoints"),
            cfg.get("checkpoints.checkpoints_name", default="seg"),
            config_dict=cfg.to_dict(),
        )
        resume = cfg.get("network.resume", default=None)
        if resume:
            self.state = self.ckpt.restore(self.state, path=resume)
            self.log.info(f"resumed from {resume} at step {int(self.state.step)}")
        elif cfg.get("network.resume_continue", default=False) and self.ckpt.has():
            self.state = self.ckpt.restore(self.state)
            self.log.info(f"resumed latest at step {int(self.state.step)}")

    # ------------------------------------------------------------------
    def request_stop(self) -> None:
        """Ask the train loop to stop at the next iteration boundary.

        Used by the preemption handler (SIGTERM on preemptible TPU VMs);
        safe to call from signal context — it only flips a flag."""
        self._stop_requested = True

    def _install_preempt_handlers(self):
        """SIGTERM/SIGINT → checkpoint-and-exit-cleanly.

        TPU-native failure story: preemptible/spot TPU VMs get SIGTERM
        ~30s before shutdown.  The handler requests a graceful stop; the
        loop saves a full resumable state (params+opt+step+queues+rng —
        engine/checkpoint.py) and returns.  Restarting with
        ``network.resume_continue=true`` picks up at the same iteration.
        (Reference has no counterpart: its DDP trainer dies mid-epoch.)
        """
        import signal

        names = self.cfg.get(
            "train.preempt_signals", default=["SIGTERM", "SIGINT"]
        )
        prev = {}
        for name in names:
            sig = getattr(signal, name, None)
            if sig is None:
                continue

            def _handler(signum, frame, _name=name):
                self.log.info(
                    f"{_name} received: stopping after current step "
                    "(state will be checkpointed)"
                )
                self.request_stop()

            try:
                prev[sig] = signal.signal(sig, _handler)
            except (ValueError, OSError):  # non-main thread / exotic sig
                pass
        return prev

    @staticmethod
    def _restore_handlers(prev) -> None:
        import signal

        for sig, handler in prev.items():
            try:
                signal.signal(sig, handler)
            except (ValueError, OSError):
                pass

    def _device_prefetch(self, it, size: int):
        """Yield device-placed {image, label} batches, keeping up to
        ``size`` in flight so H2D transfer overlaps the running step."""
        from collections import deque

        def place(batch):
            b = {"image": batch["image"], "label": batch["label"]}
            if self.mesh is not None:
                return shard_batch(b, self.mesh)
            return jax.device_put(b)

        buf: deque = deque()
        for batch in it:
            buf.append(place(batch))
            while len(buf) > size:
                yield buf.popleft()
        while buf:
            yield buf.popleft()

    def train(self, max_iters: Optional[int] = None) -> dict:
        cfg = self.cfg
        max_iters = max_iters or cfg.get("solver.max_iters", default=40000)
        display_iter = cfg.get("solver.display_iter", default=10)
        test_interval = cfg.get("solver.test_interval", default=2000)
        save_iters = cfg.get("checkpoints.save_iters", default=1000)
        self._stop_requested = False
        prev_handlers = self._install_preempt_handlers()

        pipeline = build_pipeline(cfg, "train")
        # Device-side prefetch: start the host->device copy (or mesh
        # sharding) of the NEXT batch while the current step executes
        # (jax dispatch is async, so device_put overlaps compute).  Depth
        # 1 suffices to hide a 48 MB fp32 batch transfer; 0 places each
        # batch synchronously.
        data_iter = self._device_prefetch(
            iter(pipeline), cfg.get("train.device_prefetch", default=1))

        # SWA trigger schedule (reference trainer_contrastive.py:185-187,
        # 291-296): average at 5 evenly spaced points in the last 25% of
        # training, swap + BN re-estimation at the end.
        swa_on = "swa" in cfg.get("lr.lr_policy", default="lambda_poly")
        swa = None
        if swa_on:
            from contrastiveseg_tpu.engine.swa import init_swa

            swa_normal_iters = int(max_iters * 0.75)
            swa_step_iters = (max_iters - swa_normal_iters) // 5 + 1
            swa = init_swa(self.state.params)

        last_scores: dict = {}
        t_data = t_step = 0.0
        t0 = time.time()
        step0 = int(self.state.step)
        for it in range(step0, max_iters):
            td0 = time.time()
            batch = next(data_iter)  # already device-placed/sharded
            t_data += time.time() - td0

            ts0 = time.time()
            self.state, metrics = self.train_step(self.state, batch)
            if (it + 1) % display_iter == 0:
                metrics = jax.device_get(metrics)  # sync point
                t_step += time.time() - ts0
                imgs = batch["image"].shape[0] * display_iter
                self.log.info(
                    f"iter {it + 1}/{max_iters} "
                    f"loss {float(metrics['loss']):.4f} "
                    f"seg {float(metrics.get('loss_seg', 0)):.4f} "
                    f"contrast {float(metrics.get('loss_contrast', 0)):.4f} "
                    f"({imgs / max(time.time() - t0, 1e-9):.2f} img/s, "
                    f"data {t_data:.2f}s step {t_step:.2f}s)"
                )
                t_data = t_step = 0.0
                t0 = time.time()
            else:
                t_step += time.time() - ts0

            if swa_on and (it + 1) > swa_normal_iters and (
                (it + 1 - swa_normal_iters) % swa_step_iters == 0
                or (it + 1) == max_iters
            ):
                from contrastiveseg_tpu.engine.swa import update_swa

                swa = update_swa(swa, self.state.params)
                self.log.info(f"SWA update {int(swa.n_averaged)} at iter {it + 1}")

            if (it + 1) % save_iters == 0:
                self.ckpt.save(self.state, "latest")
            if test_interval and (it + 1) % test_interval == 0:
                last_scores = self.validate()
                if self.plateau is not None:
                    from contrastiveseg_tpu.engine.optim import (
                        set_plateau_scale,
                    )

                    scale = self.plateau.step(last_scores["miou"])
                    self.state = self.state.replace(
                        opt_state=set_plateau_scale(
                            self.state.opt_state, scale))
            if self._stop_requested:
                self.ckpt.save(self.state, "latest")
                self.log.info(
                    f"preempted: full state saved at iter {it + 1}; "
                    "restart with network.resume_continue=true to resume"
                )
                self._restore_handlers(prev_handlers)
                return last_scores

        self._restore_handlers(prev_handlers)
        if swa_on and int(swa.n_averaged) > 0:
            # swap_swa_sgd + bn_update (trainer_contrastive.py:422-425).
            from contrastiveseg_tpu.engine.swa import swap_to_swa

            self.state = swap_to_swa(self.state, swa)
            self._reestimate_bn(data_iter)
            last_scores = self.validate()
        self.ckpt.save(self.state, "latest")
        return last_scores

    def _reestimate_bn(self, data_iter, num_batches: int = 20) -> None:
        """Re-estimate BN running stats for SWA-averaged params — EXACT
        torchcontrib bn_update semantics (reference SWA hooks,
        trainer_contrastive.py:291-296,422-425): the running stats become
        the PLAIN AVERAGE of per-batch statistics over ``num_batches``
        train-mode forwards (torchcontrib sets momentum=None, i.e. a
        cumulative average).  flax BN emits an EMA
        (new = m*old + (1-m)*batch); each batch's statistic is recovered
        exactly as (new - m*old)/(1-m), then averaged uniformly.
        Pinned against torch BatchNorm(momentum=None) in
        tests/test_swa_bn.py."""
        from contrastiveseg_tpu.models.layers import BN_MOMENTUM

        m = BN_MOMENTUM

        @jax.jit
        def batch_stats_of(params, base_stats, images):
            _, mut = self.model.apply(
                {"params": params, "batch_stats": base_stats},
                images, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return jax.tree.map(
                lambda new, old: (new - m * old) / (1.0 - m),
                mut["batch_stats"], base_stats)

        base = self.state.batch_stats
        avg = None
        for i in range(num_batches):
            batch = next(data_iter)  # already device-placed/sharded
            bstat = batch_stats_of(self.state.params, base, batch["image"])
            if avg is None:
                avg = bstat
            else:
                avg = jax.tree.map(
                    lambda a, b, k=i: a * (k / (k + 1.0)) + b / (k + 1.0),
                    avg, bstat)
        self.state = self.state.replace(batch_stats=avg)

    def validate(self, max_batches: Optional[int] = None) -> dict:
        if self._val_pipe is None:
            self._val_pipe = build_pipeline(self.cfg, "val")
        batches = self._val_pipe.epoch_iter(0)
        if max_batches is not None:
            import itertools

            batches = itertools.islice(batches, max_batches)
        scores = self.evaluator.run(
            self.state.params, self.state.batch_stats, batches
        )
        self.log.info(
            f"val: mIoU {scores['miou']:.4f} pixel_acc {scores['pixel_acc']:.4f}"
        )
        self.ckpt.save_by_mode(
            self.state, "performance", performance=scores["miou"]
        )
        return scores
