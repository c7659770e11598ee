"""SPMD correctness: one jitted train step over the 8-device CPU mesh
(sharded batch; BN stats and gradients globally reduced by construction)
matches the unsharded single-device step on the SAME batch.

Tolerances are set by fp32 reduction-order noise, not logic: different
parallel reduction trees perturb each BatchNorm's mean/var at ~1e-7,
and ~30 stacked BN layers amplify that to ~1e-5 relative in the loss
and ~1e-3 absolute in one SGD step's parameters (measured).  Bitwise
equality across shardings is not an SPMD property anywhere; statistical
equivalence is — unlike the reference, whose per-rank DDP batch stats
and memory queues genuinely diverge (SURVEY.md §2.9/§2.10).

The contrast term stays inside the warmup gate (reference ``0*loss``
semantics): the graph still runs it, but the approx_max_k anchor
sampler — documented as layout-sensitive (ops/contrast.py) — adds no
gradient, keeping the comparison about CE + SyncBN + SGD.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastiveseg_tpu.presets import get_preset


def _cfg(tmp_path, tag):
    cfg = get_preset("smoke_hrnet_w18")
    cfg = cfg.updated("train.batch_size", 8)
    cfg = cfg.updated("data.synthetic_size", [32, 64])
    cfg = cfg.updated("train.data_transformer.input_size", [64, 32])
    cfg = cfg.updated("train_trans.random_crop.crop_size", [64, 32])
    cfg = cfg.updated("data.synthetic_length", 8)
    cfg = cfg.updated("contrast.warmup_iters", 10)
    cfg = cfg.updated("checkpoints.checkpoints_dir", str(tmp_path / tag))
    return cfg


def test_mesh_step_matches_single_device(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (run via ./run_tests.sh)")
    from contrastiveseg_tpu.engine.trainer import Trainer
    from contrastiveseg_tpu.parallel.mesh import shard_batch

    t_mesh = Trainer(_cfg(tmp_path, "mesh"), use_mesh=True)
    t_solo = Trainer(_cfg(tmp_path, "solo"), use_mesh=False)

    def leaf(state):
        return np.asarray(jax.device_get(
            state.params["backbone"]["stem1"]["conv"]["kernel"]))

    # Identical init by construction (same seed/config).
    np.testing.assert_array_equal(leaf(t_mesh.state), leaf(t_solo.state))

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.standard_normal((8, 32, 64, 3)).astype(np.float32)),
        "label": jnp.asarray(
            rng.integers(0, 19, size=(8, 32, 64)).astype(np.int32)),
    }
    s_mesh, m_mesh = t_mesh.train_step(
        t_mesh.state, shard_batch(batch, t_mesh.mesh))
    s_solo, m_solo = t_solo.train_step(t_solo.state, batch)

    l_mesh = float(jax.device_get(m_mesh["loss"]))
    l_solo = float(jax.device_get(m_solo["loss"]))
    assert np.isclose(l_mesh, l_solo, rtol=1e-4), (l_mesh, l_solo)

    a, b = leaf(s_mesh), leaf(s_solo)
    np.testing.assert_allclose(a, b, atol=5e-3, rtol=0)
    assert float(np.max(np.abs(a - b))) < 5e-3

    # SyncBN running stats agree: global-batch reduction == full batch.
    flat_a = jax.tree_util.tree_leaves(jax.device_get(s_mesh.batch_stats))
    flat_b = jax.tree_util.tree_leaves(jax.device_get(s_solo.batch_stats))
    worst = max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(flat_a, flat_b)
    )
    assert worst < 1e-2, f"batch-stat divergence {worst}"
