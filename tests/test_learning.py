"""Learning proof: overfit a fixed synthetic batch to high train mIoU.

VERDICT.md round-1 gap #2: the repo had unit equivalence but no evidence a
model *learns*.  This drives the real jitted train step (model forward, CE
loss, SGD update, BN batch stats) for a few hundred steps on one fixed
batch and demands near-perfect memorization — the cheapest end-to-end
optimization check that would catch sign errors, dead gradients, BN-state
mixups, or LR plumbing bugs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from contrastiveseg_tpu.losses.ce import cross_entropy
from contrastiveseg_tpu.models.hrnet import HRNET_SPECS, _hrnet_spec
from contrastiveseg_tpu.models.nets import HRNetSeg

# Full HRNet topology at width 8: same stages/fusion as W48, CPU-fast.
HRNET_SPECS.setdefault("hrnet8_test", _hrnet_spec(8))

C = 4


def _fixture_batch(rng, B=2, H=32, W=64):
    """Images whose label structure is derivable from pixel values: blocky
    class regions with class-dependent color means (learnable, not noise)."""
    labels = rng.integers(0, C, size=(B, H // 8, W // 8)).astype(np.int32)
    labels = np.kron(labels, np.ones((8, 8), np.int32))  # 8x8 blocks
    means = rng.standard_normal((C, 3)).astype(np.float32) * 2.0
    images = means[labels] + 0.1 * rng.standard_normal((B, H, W, 3)).astype(
        np.float32)
    # A few ignore pixels exercise the -1 path.
    ignore = rng.random((B, H, W)) < 0.02
    labels = np.where(ignore, -1, labels)
    return jnp.asarray(images), jnp.asarray(labels)


def _miou(pred, labels):
    ious = []
    pred, labels = np.asarray(pred), np.asarray(labels)
    for c in range(C):
        inter = ((pred == c) & (labels == c)).sum()
        union = (((pred == c) | (labels == c)) & (labels >= 0)).sum()
        if union:
            ious.append(inter / union)
    return float(np.mean(ious))


def test_overfit_fixture():
    rng = np.random.default_rng(0)
    images, labels = _fixture_batch(rng)
    model = HRNetSeg(num_classes=C, arch="hrnet8_test")

    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, images, train=True)
    tx = optax.adam(3e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            return cross_entropy(out["seg"], labels), (
                mut["batch_stats"], out["seg"])

        (loss, (bs, seg)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, bs, opt_state, loss, seg

    params, batch_stats = variables["params"], variables["batch_stats"]
    losses = []
    seg = None
    for i in range(300):
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, loss, seg = step(
            params, batch_stats, opt_state, sub)
        if i % 50 == 0:
            losses.append(float(loss))
    miou = _miou(np.argmax(np.asarray(seg), -1), labels)
    assert losses[0] > 3 * losses[-1], f"loss did not drop: {losses}"
    assert miou >= 0.95, f"train mIoU {miou:.3f} after overfitting: {losses}"


def test_overfit_with_contrast_memory_loss():
    """Same fixture memorized through the FULL mem-contrast pipeline
    (static-shape sampler + queue enqueue + InfoNCE): demonstrates the
    sampler/queue redesigns (approx_max_k, include_class0, ring pointers —
    VERDICT.md weak-6) do not impede learning."""
    from contrastiveseg_tpu.engine.state import TrainState
    from contrastiveseg_tpu.engine.train_step import make_train_step
    from contrastiveseg_tpu.losses.manager import build_loss
    from contrastiveseg_tpu.ops.queue import init_memory_bank
    from contrastiveseg_tpu.utils.config import Config

    rng = np.random.default_rng(1)
    images, labels = _fixture_batch(rng)
    model = HRNetSeg(num_classes=C, arch="hrnet8_test", with_proj=True)

    cfg = Config.from_args(overrides=[
        f"data.num_classes={C}",
        "loss.loss_type=mem_contrast_ce_loss",
        "loss.params.ce_weight=None", "loss.params.ce_ignore_index=-1",
        "contrast.temperature=0.07", "contrast.base_temperature=0.07",
        "contrast.max_samples=64", "contrast.max_views=8",
        "contrast.loss_weight=0.1", "contrast.with_memory=true",
        "contrast.memory_size=32", "contrast.proj_dim=256",
        "network.stride=4",
    ])
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, images, train=True)
    tx = optax.adam(3e-3)
    bank = init_memory_bank(key, C, 32, 256)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        bank=bank,
        rng=key,
        tx=tx,
    )
    step = make_train_step(model, build_loss(cfg), warmup_iters=0,
                           network_stride=4, pixel_update_freq=4,
                           donate=False)

    batch = {"image": images, "label": labels}
    metrics = None
    for _ in range(300):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(jax.device_get(state.bank.segment_ptr).sum()) > 0

    # Train-set mIoU from an eval-mode forward.
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        images, train=False)
    from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners

    seg = resize_bilinear_align_corners(
        out["seg"], (labels.shape[1], labels.shape[2]))
    miou = _miou(np.argmax(np.asarray(seg), -1), labels)
    assert miou >= 0.95, f"train mIoU {miou:.3f} with contrast+memory loss"


def test_momentum_encoder_keys():
    """contrast.momentum_encoder: key_params track an EMA of params
    (MoCo order: EMA update then key forward) and the bank is fed the
    KEY encoder's embeddings, not q.detach().

    The reference sketches this but never instantiates encoder_k
    (nets/hrnet.py:173-176) — here it's an executable opt-in.
    """
    import optax

    from contrastiveseg_tpu.engine.state import TrainState
    from contrastiveseg_tpu.engine.train_step import make_train_step
    from contrastiveseg_tpu.losses.manager import build_loss
    from contrastiveseg_tpu.ops.queue import init_memory_bank
    from contrastiveseg_tpu.utils.config import Config

    rng = np.random.default_rng(5)
    images, labels = _fixture_batch(rng)
    model = HRNetSeg(num_classes=C, arch="hrnet8_test", with_proj=True)
    cfg = Config.from_args(overrides=[
        f"data.num_classes={C}",
        "loss.loss_type=mem_contrast_ce_loss",
        "loss.params.ce_weight=None", "loss.params.ce_ignore_index=-1",
        "contrast.temperature=0.07", "contrast.base_temperature=0.07",
        "contrast.max_samples=64", "contrast.max_views=8",
        "contrast.loss_weight=0.1", "contrast.with_memory=true",
        "contrast.memory_size=32", "contrast.proj_dim=256",
        "network.stride=4",
    ])
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, images,
                           train=True)
    tx = optax.sgd(1e-2)

    def make_state():
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            bank=init_memory_bank(key, C, 32, 256),
            rng=key,
            tx=tx,
            key_params=jax.tree.map(jnp.array, variables["params"]),
        )

    m = 0.5
    step = make_train_step(model, build_loss(cfg), warmup_iters=0,
                           network_stride=4, pixel_update_freq=4,
                           donate=False, momentum_encoder=True,
                           encoder_momentum=m)
    s1, _ = step(make_state(), {"image": images, "label": labels})

    # EMA formula (first step: key == params before the optimizer update,
    # so EMA stays at the init weights exactly).
    leaf = lambda t: np.asarray(
        jax.tree_util.tree_leaves(t)[0])
    np.testing.assert_allclose(
        leaf(s1.key_params), leaf(variables["params"]), atol=1e-7)
    s2, _ = step(s1, {"image": images, "label": labels})
    expect = leaf(s1.key_params) * m + leaf(s1.params) * (1 - m)
    np.testing.assert_allclose(leaf(s2.key_params), expect, atol=1e-6)

    # Keys come from the key encoder: with the same seed but momentum off,
    # the first-step bank differs (q.detach() vs EMA forward) only after
    # params diverge — compare step 2 banks.
    step_plain = make_train_step(model, build_loss(cfg), warmup_iters=0,
                                 network_stride=4, pixel_update_freq=4,
                                 donate=False)
    p1, _ = step_plain(make_state(), {"image": images, "label": labels})
    p2, _ = step_plain(p1, {"image": images, "label": labels})
    assert not np.allclose(
        np.asarray(s2.bank.pixel_queue), np.asarray(p2.bank.pixel_queue))
    # Both produce finite, advancing queues.
    assert int(np.asarray(s2.bank.segment_ptr).sum()) > 0
