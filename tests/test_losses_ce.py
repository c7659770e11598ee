"""CE loss family vs torch nn.CrossEntropyLoss (reference semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from contrastiveseg_tpu.losses.ce import (
    aux_cross_entropy,
    cross_entropy,
    ohem_cross_entropy,
)

CITYSCAPES_W = [
    0.8373, 0.9180, 0.8660, 1.0345, 1.0166, 0.9969, 0.9754, 1.0489, 0.8786,
    1.0023, 0.9539, 0.9843, 1.1116, 0.9037, 1.0865, 1.0955, 1.0865, 1.1529,
    1.0507,
]


def _rand(b=2, h=16, w=24, c=19, seed=0, ignore_frac=0.2):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, h, w, c), dtype=np.float32)
    labels = rng.integers(0, c, size=(b, h, w)).astype(np.int32)
    mask = rng.random((b, h, w)) < ignore_frac
    labels[mask] = -1
    return logits, labels


def _torch_ce(logits, labels, weight=None, ignore_index=-1):
    t_logits = torch.from_numpy(logits).permute(0, 3, 1, 2)
    t_labels = torch.from_numpy(labels).long()
    w = torch.tensor(weight, dtype=torch.float32) if weight is not None else None
    return F.cross_entropy(
        t_logits, t_labels, weight=w, ignore_index=ignore_index
    ).item()


def test_plain_ce_matches_torch():
    logits, labels = _rand()
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(ours - _torch_ce(logits, labels)) < 1e-5


def test_weighted_ce_matches_torch():
    logits, labels = _rand(seed=3)
    ours = float(
        cross_entropy(jnp.asarray(logits), jnp.asarray(labels), CITYSCAPES_W)
    )
    assert abs(ours - _torch_ce(logits, labels, CITYSCAPES_W)) < 1e-5


def test_ce_scales_target_when_needed():
    logits, labels = _rand(h=8, w=12, seed=4)
    big_labels = np.repeat(np.repeat(labels, 4, axis=1), 4, axis=2)
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(big_labels)))
    ref = _torch_ce(logits, labels)
    assert abs(ours - ref) < 1e-5


def test_aux_ce():
    logits, labels = _rand(seed=5)
    aux, _ = _rand(seed=6)
    ours = float(
        aux_cross_entropy(
            jnp.asarray(logits), jnp.asarray(aux), jnp.asarray(labels),
            class_weight=CITYSCAPES_W,
        )
    )
    ref = _torch_ce(logits, labels, CITYSCAPES_W) + 0.4 * _torch_ce(
        aux, labels, CITYSCAPES_W
    )
    assert abs(ours - ref) < 1e-5


def _torch_ohem(logits, labels, thresh, min_kept, weight=None, ignore=-1):
    """Direct port of FSOhemCELoss.forward (loss_helper.py:238-261)."""
    predict = torch.from_numpy(logits).permute(0, 3, 1, 2)
    target = torch.from_numpy(labels).long()
    w = torch.tensor(weight, dtype=torch.float32) if weight is not None else None
    ce = torch.nn.CrossEntropyLoss(weight=w, ignore_index=ignore, reduction="none")
    prob_out = torch.softmax(predict, dim=1)
    tmp = target.clone()
    tmp[tmp == ignore] = 0
    prob = prob_out.gather(1, tmp.unsqueeze(1))
    mask = target.contiguous().view(-1) != ignore
    sort_prob, sort_indices = prob.contiguous().view(-1)[mask].contiguous().sort()
    min_threshold = sort_prob[min(min_kept, sort_prob.numel() - 1)]
    threshold = max(min_threshold, thresh)
    loss_matrix = ce(predict, target).contiguous().view(-1)
    sort_loss = loss_matrix[mask][sort_indices]
    select = sort_loss[sort_prob < threshold]
    return select.mean().item()


def test_ohem_matches_torch_port():
    logits, labels = _rand(b=2, h=20, w=20, seed=7)
    for min_kept in (10, 200):
        ours = float(
            ohem_cross_entropy(
                jnp.asarray(logits), jnp.asarray(labels),
                thresh=0.7, min_kept=min_kept, class_weight=CITYSCAPES_W,
            )
        )
        ref = _torch_ohem(logits, labels, 0.7, min_kept, CITYSCAPES_W)
        assert abs(ours - ref) < 1e-4, (min_kept, ours, ref)


def test_ce_grad_finite():
    logits, labels = _rand(seed=8)
    g = jax.grad(
        lambda x: cross_entropy(x, jnp.asarray(labels), CITYSCAPES_W)
    )(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()


def test_fs_auxohemce_and_dsn_registry():
    """fs_auxohemce_loss (OHEM seg + CE aux, loss_helper.py:264-281) and
    fs_auxce_dsn_loss (seg CE + mean of seg_aux* CEs, :284-298)."""
    import jax.random as jr
    import numpy as np

    from contrastiveseg_tpu.losses.ce import cross_entropy, ohem_cross_entropy
    from contrastiveseg_tpu.losses.manager import LOSSES
    from contrastiveseg_tpu.utils.config import Config

    cfg = Config({
        "data": {"num_classes": 5},
        "network": {"loss_weights": {"seg_loss": 1.0, "aux_loss": 0.4}},
        "loss": {"params": {"ohem_thresh": 0.7, "ohem_minkeep": 10}},
    })
    rng = np.random.default_rng(3)
    out = {
        "seg": jnp.asarray(rng.standard_normal((2, 8, 8, 5)).astype("f4")),
        "seg_aux": jnp.asarray(
            rng.standard_normal((2, 8, 8, 5)).astype("f4")),
        "seg_aux2": jnp.asarray(
            rng.standard_normal((2, 8, 8, 5)).astype("f4")),
    }
    lab = jnp.asarray(rng.integers(0, 5, size=(2, 8, 8)).astype("i4"))

    total, _ = LOSSES.get("fs_auxohemce_loss")(cfg)(
        jr.key(0), out, lab, False, None)
    want = ohem_cross_entropy(out["seg"], lab, 0.7, 10, None, -1) \
        + 0.4 * cross_entropy(out["seg_aux"], lab, None, -1)
    # NOTE: aux branch of fs_auxohemce uses only the primary seg_aux in
    # the reference (two-output models); seg_aux2 contributes to DSN only.
    assert np.isclose(float(total), float(want), rtol=1e-6)

    total, _ = LOSSES.get("fs_auxce_dsn_loss")(cfg)(
        jr.key(0), out, lab, False, None)
    aux_mean = (cross_entropy(out["seg_aux"], lab, None, -1)
                + cross_entropy(out["seg_aux2"], lab, None, -1)) / 2
    want = cross_entropy(out["seg"], lab, None, -1) + 0.4 * aux_mean
    assert np.isclose(float(total), float(want), rtol=1e-6)
