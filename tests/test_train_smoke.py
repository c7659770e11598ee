"""End-to-end smoke: Trainer over an 8-device CPU mesh, 2 iters + val.

This is the SURVEY.md §4(c)+(d) test: multi-device SPMD (psum'd BN stats,
replicated state, sharded batch) exercised without TPUs.
"""

import numpy as np
import pytest

from contrastiveseg_tpu.presets import get_preset


@pytest.fixture(scope="module")
def trainer():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip(
            "needs 8 CPU devices — run via ./run_tests.sh (the host "
            "sitecustomize pins JAX_PLATFORMS=axon before conftest runs)"
        )
    cfg = get_preset("smoke_hrnet_w18")
    # SWA + gradient clipping wired through config (VERDICT.md weak-3):
    # with max_iters=2 the SWA trigger fires at iter 2, then the trainer
    # swaps to averaged params and re-estimates BN.
    cfg = cfg.updated("lr.lr_policy", "swa_lambda_poly")
    cfg = cfg.updated("network.clip_grad_norm", 10.0)
    # Batch divisible by the 8-device mesh; tiny images for CPU speed.
    cfg = cfg.updated("train.batch_size", 8)
    cfg = cfg.updated("val.batch_size", 8)
    cfg = cfg.updated("data.synthetic_size", [32, 64])
    cfg = cfg.updated("train.data_transformer.input_size", [64, 32])
    cfg = cfg.updated("val.data_transformer.input_size", [64, 32])
    cfg = cfg.updated("train_trans.random_crop.crop_size", [64, 32])
    cfg = cfg.updated("data.synthetic_length", 16)
    from contrastiveseg_tpu.engine.trainer import Trainer

    return Trainer(cfg)


def test_two_train_steps_update_state(trainer):
    import jax

    p0 = jax.device_get(
        trainer.state.params["backbone"]["stem1"]["conv"]["kernel"]
    )
    bank0 = jax.device_get(trainer.state.bank.segment_ptr)
    scores = trainer.train(max_iters=2)
    assert int(trainer.state.step) == 2
    p1 = jax.device_get(
        trainer.state.params["backbone"]["stem1"]["conv"]["kernel"]
    )
    assert not np.allclose(p0, p1), "params did not update"
    bank1 = jax.device_get(trainer.state.bank.segment_ptr)
    assert bank1.sum() > bank0.sum(), "memory bank did not enqueue"


def test_validation_runs(trainer):
    scores = trainer.validate(max_batches=1)
    assert 0.0 <= scores["miou"] <= 1.0
    assert scores["pixel_acc"] > 0.0


def test_checkpoint_roundtrip(tmp_path, trainer):
    import jax

    trainer.ckpt.dir = str(tmp_path)
    trainer.ckpt.save(trainer.state, "latest")
    restored = trainer.ckpt.restore(trainer.state)
    np.testing.assert_array_equal(
        jax.device_get(trainer.state.step), jax.device_get(restored.step)
    )
    a = jax.device_get(trainer.state.params["backbone"]["stem1"]["conv"]["kernel"])
    b = jax.device_get(restored.params["backbone"]["stem1"]["conv"]["kernel"])
    np.testing.assert_array_equal(a, b)


def test_freeze_bn_stops_stat_updates(tmp_path):
    """network.freeze_bn (ModuleRunner.freeze_bn, module_runner.py:228-236):
    BN running stats stay bit-identical across train steps while params
    still learn (the --finetune flow, main_contrastive.py:204)."""
    import jax

    from contrastiveseg_tpu.engine.trainer import Trainer

    cfg = get_preset("smoke_hrnet_w18")
    cfg = cfg.updated("network.freeze_bn", True)
    cfg = cfg.updated("data.synthetic_size", [32, 64])
    cfg = cfg.updated("train.data_transformer.input_size", [64, 32])
    cfg = cfg.updated("train_trans.random_crop.crop_size", [64, 32])
    cfg = cfg.updated("checkpoints.checkpoints_dir", str(tmp_path))
    t = Trainer(cfg, use_mesh=False)

    bs0 = jax.device_get(t.state.batch_stats)
    p0 = jax.device_get(
        t.state.params["backbone"]["stem1"]["conv"]["kernel"])
    t.train(max_iters=2)
    bs1 = jax.device_get(t.state.batch_stats)
    p1 = jax.device_get(
        t.state.params["backbone"]["stem1"]["conv"]["kernel"])

    assert not np.allclose(p0, p1), "params did not update under freeze_bn"
    flat0 = jax.tree_util.tree_leaves(bs0)
    flat1 = jax.tree_util.tree_leaves(bs1)
    assert len(flat0) == len(flat1) and len(flat0) > 0
    for a, b in zip(flat0, flat1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
