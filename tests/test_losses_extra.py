"""RMI and Lovász losses vs direct torch ports of the reference."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from contrastiveseg_tpu.losses.lovasz import lovasz_softmax
from contrastiveseg_tpu.losses.rmi import rmi_loss


def _torch_lovasz_flat(preds, targets, only_present=True):
    """Port of lovasz_softmax_flat + lovasz_grad (lovasz_loss.py:216-260)."""
    C = preds.shape[1]
    losses = []
    for c in range(C):
        fg = (targets == c).float()
        if only_present and fg.sum() == 0:
            continue
        errors = (fg - preds[:, c]).abs()
        errors_sorted, perm = torch.sort(errors, 0, descending=True)
        fg_sorted = fg[perm]
        p = len(fg_sorted)
        gts = fg_sorted.sum()
        intersection = gts - fg_sorted.cumsum(0)
        union = gts + (1 - fg_sorted).cumsum(0)
        jaccard = 1.0 - intersection / union
        if p > 1:
            jaccard[1:p] = jaccard[1:p] - jaccard[0:-1]
        losses.append(torch.dot(errors_sorted, jaccard))
    return torch.stack(losses).mean().item()


def test_lovasz_matches_torch():
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 12, 14, 5
    logits = rng.standard_normal((B, H, W, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
    labels[rng.random((B, H, W)) < 0.2] = -1
    probs = torch.softmax(torch.from_numpy(logits).reshape(-1, C), dim=1)
    y = torch.from_numpy(labels).reshape(-1)
    valid = y != -1
    ref = _torch_lovasz_flat(probs[valid], y[valid])

    ours = float(
        lovasz_softmax(
            jnp.asarray(
                torch.softmax(torch.from_numpy(logits), dim=-1).numpy()
            ),
            jnp.asarray(labels),
        )
    )
    assert abs(ours - ref) < 1e-5, (ours, ref)


def _torch_rmi(logits, labels, num_classes, radius=3, pool=3, pool_way=0,
               weight_lambda=0.5):
    """Port of RMILoss.forward_sigmoid + rmi_lower_bound (rmi_loss.py)."""
    _CLIP_MIN, _POS_ALPHA = 1e-6, 1e-3
    logits_4D = torch.from_numpy(logits).permute(0, 3, 1, 2).double()
    labels_4D = torch.from_numpy(labels).long()
    labels_4D = labels_4D.clone()
    labels_4D[labels_4D < 0] = 255
    label_mask_3D = labels_4D < num_classes
    valid_onehot = F.one_hot(labels_4D * label_mask_3D.long(),
                             num_classes).double()
    mask = label_mask_3D.double()
    valid_onehot = valid_onehot * mask.unsqueeze(3)
    logits_flat = logits_4D.permute(0, 2, 3, 1).reshape(-1, num_classes)
    bce = F.binary_cross_entropy_with_logits(
        logits_flat, target=valid_onehot.reshape(-1, num_classes),
        weight=mask.reshape(-1).unsqueeze(1), reduction="sum",
    )
    bce_loss = bce / (mask.sum() + 1.0)
    probs_4D = logits_4D.sigmoid() * mask.unsqueeze(1) + _CLIP_MIN
    onehot_4D = valid_onehot.permute(0, 3, 1, 2)
    if pool > 1:
        pad = pool // 2
        onehot_4D = F.max_pool2d(onehot_4D, pool, pool, pad)
        probs_4D = F.max_pool2d(probs_4D, pool, pool, pad)
    n, c, h, w = onehot_4D.shape
    nh, nw = h - (radius - 1), w - (radius - 1)
    la, pr = [], []
    for y in range(radius):
        for x in range(radius):
            la.append(onehot_4D[:, :, y:y + nh, x:x + nw])
            pr.append(probs_4D[:, :, y:y + nh, x:x + nw])
    half_d = radius * radius
    la = torch.stack(la, dim=2).reshape(n, c, half_d, -1)
    pr = torch.stack(pr, dim=2).reshape(n, c, half_d, -1)
    eye = torch.eye(half_d).double()
    la = la - la.mean(dim=3, keepdim=True)
    pr = pr - pr.mean(dim=3, keepdim=True)
    la_cov = la @ la.transpose(2, 3)
    pr_cov = pr @ pr.transpose(2, 3)
    pr_cov_inv = torch.inverse(pr_cov + eye * _POS_ALPHA)
    la_pr_cov = la @ pr.transpose(2, 3)
    appro_var = la_cov - la_pr_cov @ pr_cov_inv @ la_pr_cov.transpose(-2, -1)
    chol = torch.linalg.cholesky(appro_var + eye * _POS_ALPHA)
    rmi_now = 2.0 * torch.sum(
        torch.log(torch.diagonal(chol, dim1=-2, dim2=-1) + 1e-8), dim=-1
    ) * 0.5
    rmi_per_class = rmi_now.reshape(-1, num_classes).mean(dim=0) / half_d
    rmi = rmi_per_class.sum()
    return (weight_lambda * bce_loss + rmi * (1 - weight_lambda)).item()


def test_rmi_matches_torch_port():
    rng = np.random.default_rng(1)
    B, H, W, C = 2, 24, 24, 4
    logits = rng.standard_normal((B, H, W, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
    labels[rng.random((B, H, W)) < 0.1] = -1
    ref = _torch_rmi(logits, labels, C)
    ours = float(rmi_loss(jnp.asarray(logits), jnp.asarray(labels), C))
    assert abs(ours - ref) < 5e-3, (ours, ref)
