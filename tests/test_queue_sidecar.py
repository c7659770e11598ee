"""Torch-imported MEM checkpoints seed the memory bank.

tools/import_torch_ckpt.py writes HRNet_W48_MEM's queue buffers
(nets/hrnet.py:165-171) to a ``<out>.queues.msgpack`` sidecar; the
Trainer (engine/trainer.py) restores them into ops/queue.MemoryBank when
``network.pretrained`` points at the weights file.
"""

import numpy as np

from contrastiveseg_tpu.presets import get_preset


def test_trainer_seeds_bank_from_sidecar(tmp_path):
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from contrastiveseg_tpu.engine.trainer import Trainer
    from contrastiveseg_tpu.models.nets import build_model
    from contrastiveseg_tpu.utils.torch_import import save_variables

    cfg = get_preset("smoke_hrnet_w18")
    for k, v in [("contrast.with_memory", True),
                 ("contrast.memory_size", 6),
                 ("contrast.proj_dim", 16),
                 ("loss.loss_type", "mem_contrast_ce_loss"),
                 ("checkpoints.checkpoints_dir", str(tmp_path))]:
        cfg = cfg.updated(k, v)

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           train=True)
    wpath = str(tmp_path / "mem.msgpack")
    save_variables(dict(variables), wpath)

    rs = np.random.RandomState(0)
    C, M, D = 5, 6, 16
    q = {
        "segment_queue": rs.randn(C, M, D).astype(np.float32),
        "segment_ptr": rs.randint(0, M, size=C).astype(np.int32),
        "pixel_queue": rs.randn(C, M, D).astype(np.float32),
        "pixel_ptr": rs.randint(0, M, size=C).astype(np.int32),
    }
    with open(wpath + ".queues.msgpack", "wb") as f:
        f.write(flax.serialization.msgpack_serialize(q))

    cfg = cfg.updated("network.pretrained", wpath)
    trainer = Trainer(cfg)
    bank = trainer.state.bank
    assert bank is not None
    np.testing.assert_array_equal(np.asarray(bank.segment_queue),
                                  q["segment_queue"])
    np.testing.assert_array_equal(np.asarray(bank.pixel_queue),
                                  q["pixel_queue"])
    np.testing.assert_array_equal(np.asarray(bank.segment_ptr),
                                  q["segment_ptr"])
    np.testing.assert_array_equal(np.asarray(bank.pixel_ptr),
                                  q["pixel_ptr"])
