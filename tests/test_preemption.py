"""Preemption-safe training: SIGTERM mid-run → checkpoint → resume.

The TPU-native failure-recovery story (SURVEY.md §5 "failure detection /
recovery"): preemptible/spot TPU VMs get SIGTERM shortly before shutdown.
The Trainer installs handlers that request a clean stop, saves the FULL
train state (params+opt+step+queues+rng), and a restarted Trainer with
``network.resume_continue=true`` continues from the same iteration.  The
reference (DDP/NCCL, /root/reference/segmentor/trainer_contrastive.py)
has no counterpart — it dies mid-epoch and restarts from the last
`save_iters` multiple, losing the optimizer state.
"""

import signal

import numpy as np
import pytest

from contrastiveseg_tpu.presets import get_preset


def _cfg(tmp_path):
    cfg = get_preset("smoke_hrnet_w18")
    cfg = cfg.updated("train.batch_size", 8)
    cfg = cfg.updated("val.batch_size", 8)
    cfg = cfg.updated("data.synthetic_size", [32, 64])
    cfg = cfg.updated("train.data_transformer.input_size", [64, 32])
    cfg = cfg.updated("val.data_transformer.input_size", [64, 32])
    cfg = cfg.updated("train_trans.random_crop.crop_size", [64, 32])
    cfg = cfg.updated("data.synthetic_length", 16)
    cfg = cfg.updated("solver.test_interval", 0)
    cfg = cfg.updated("checkpoints.save_iters", 1000)
    cfg = cfg.updated("checkpoints.checkpoints_dir", str(tmp_path))
    return cfg


def test_sigterm_checkpoints_and_resumes(tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (run via ./run_tests.sh)")
    from contrastiveseg_tpu.engine.trainer import Trainer

    trainer = Trainer(_cfg(tmp_path))

    # Deliver SIGALRM (stands in for SIGTERM — raising a real SIGTERM
    # inside pytest would race its own session handlers) mid-training via
    # an interval timer; the handler must stop the loop well before
    # max_iters and write a resumable "latest" checkpoint.
    trainer.cfg = trainer.cfg.updated(
        "train.preempt_signals", ["SIGTERM", "SIGALRM"]
    )
    signal.setitimer(signal.ITIMER_REAL, 0.5)
    try:
        trainer.train(max_iters=500)
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0.0)
    stopped_at = int(trainer.state.step)
    assert 0 < stopped_at < 500, "preemption did not stop the loop"
    # SIGALRM handler was restored to its previous disposition.
    assert signal.getsignal(signal.SIGALRM) is not trainer  # sanity
    assert trainer.ckpt.has(), "no checkpoint written on preemption"

    # Restart: resume_continue picks up at the preempted iteration and
    # runs to a (nearby) completion.
    cfg2 = _cfg(tmp_path).updated("network.resume_continue", True)
    trainer2 = Trainer(cfg2)
    assert int(trainer2.state.step) == stopped_at
    trainer2.train(max_iters=stopped_at + 2)
    assert int(trainer2.state.step) == stopped_at + 2
    p1 = jax.device_get(
        trainer.state.params["backbone"]["stem1"]["conv"]["kernel"]
    )
    p2 = jax.device_get(
        trainer2.state.params["backbone"]["stem1"]["conv"]["kernel"]
    )
    assert not np.allclose(p1, p2), "resumed run did not keep training"
