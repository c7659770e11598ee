"""HRNet backbone, TPU-native (flax/NHWC).

Re-design of the reference HighResolutionNet
(/root/reference/lib/models/backbones/hrnet/hrnet_backbone.py:108-801) and its
yacs stage specs (hrnet_config.py:46-181).  Semantics kept:

  * stem: two stride-2 3x3 convs (64ch) -> layer1 = Bottleneck x4 (256ch);
  * stages 2/3/4 of HighResolutionModules with cross-resolution fusion:
    1x1 conv + BN + bilinear align_corners upsample for coarser->finer,
    chains of stride-2 3x3 conv+BN (ReLU between, none on last) for
    finer->coarser (hrnet_backbone.py:196-286);
  * transitions insert the new lowest-resolution branch with a stride-2 conv.

TPU-first differences: NHWC layout, fuse upsampling runs as separable MXU
matmuls (ops/resize.py), BN is sync-by-construction under the mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from contrastiveseg_tpu.models.layers import BasicBlock, Bottleneck, ConvBN
from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners


@dataclasses.dataclass(frozen=True)
class StageSpec:
    num_modules: int
    num_blocks: int
    num_channels: tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class HRNetSpec:
    stem_width: int
    stage1_blocks: int
    stage1_width: int
    stage2: StageSpec
    stage3: StageSpec
    stage4: StageSpec

    @property
    def out_channels(self) -> tuple[int, ...]:
        return self.stage4.num_channels


def _hrnet_spec(w: int) -> HRNetSpec:
    return HRNetSpec(
        stem_width=64,
        stage1_blocks=4,
        stage1_width=64,
        stage2=StageSpec(1, 4, (w, 2 * w)),
        stage3=StageSpec(4, 4, (w, 2 * w, 4 * w)),
        stage4=StageSpec(3, 4, (w, 2 * w, 4 * w, 8 * w)),
    )


HRNET_SPECS: dict[str, HRNetSpec] = {
    "hrnet18": _hrnet_spec(18),
    "hrnet32": _hrnet_spec(32),
    "hrnet48": _hrnet_spec(48),
    "hrnet64": _hrnet_spec(64),
}


def lane_pad_spec(spec: HRNetSpec, multiple: int = 64) -> HRNetSpec:
    """Round sub-``multiple`` branch widths up to ``multiple``.

    TPU vector lanes are 128 wide and the MXU tiles matmuls in 128-lane
    chunks; the W48 finest branch (C=48) runs its 3x3 convs at 35-46 TF/s
    in-graph with ~24 ms/step of pure layout conversion around them
    (profiled, round 2), while the same conv at padded width maps cleanly.
    Padding 48 -> 64 raises branch-0 conv FLOPs by (64/48)^2 = 1.78x but
    targets the >2x rate headroom the isolated Pallas datapoint proved
    (ops/conv_pallas.py).  Widths already >= ``multiple`` (96/192/384) are
    left alone.  This is a different (slightly wider) net, gated by
    ``network.lane_pad`` — not a drop-in for reference checkpoints.
    """

    def pad(stage: StageSpec) -> StageSpec:
        return StageSpec(
            stage.num_modules,
            stage.num_blocks,
            tuple(max(c, multiple) for c in stage.num_channels),
        )

    return dataclasses.replace(
        spec, stage2=pad(spec.stage2), stage3=pad(spec.stage3),
        stage4=pad(spec.stage4),
    )


class HighResolutionModule(nn.Module):
    """Parallel branches of Basic/Bottleneck blocks + full fusion.

    ``num_channels`` are POST-expansion widths (like the reference's
    ``num_channels * block.expansion``, hrnet_backbone.py:590-600); for
    bottleneck branches the block width is num_channels[i] // 4.
    """

    num_channels: tuple[int, ...]
    num_blocks: int
    block: str = "basic"  # basic | bottleneck
    pallas_conv: bool = False  # Pallas path for small-C 3x3 convs
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool) -> list[jnp.ndarray]:
        nb = len(self.num_channels)
        # Per-branch residual blocks.
        feats = []
        for i, x in enumerate(xs):
            for k in range(self.num_blocks):
                need_ds = k == 0 and x.shape[-1] != self.num_channels[i]
                if self.block == "bottleneck":
                    x = Bottleneck(
                        self.num_channels[i] // 4,
                        downsample=need_ds,
                        dtype=self.dtype,
                        name=f"branch{i}_block{k}",
                    )(x, train)
                else:
                    x = BasicBlock(
                        self.num_channels[i],
                        downsample=need_ds,
                        pallas=self.pallas_conv,
                        dtype=self.dtype,
                        name=f"branch{i}_block{k}",
                    )(x, train)
            feats.append(x)
        if nb == 1:
            return feats

        # Full fusion: out[i] = relu(sum_j path_{j->i}(feats[j])).
        fused = []
        for i in range(nb):
            h, w = feats[i].shape[1], feats[i].shape[2]
            acc = feats[i]
            for j in range(nb):
                if j == i:
                    continue
                if j > i:  # coarser -> finer: 1x1 conv+BN then upsample
                    y = ConvBN(
                        self.num_channels[i], 1, 1, use_relu=False,
                        dtype=self.dtype, name=f"fuse{i}_{j}",
                    )(feats[j], train)
                    y = resize_bilinear_align_corners(y, (h, w), fast=True)
                else:  # finer -> coarser: chain of stride-2 3x3 convs
                    y = feats[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        y = ConvBN(
                            self.num_channels[i] if last else self.num_channels[j],
                            3, 2, use_relu=not last, dtype=self.dtype,
                            name=f"fuse{i}_{j}_ds{k}",
                        )(y, train)
                acc = acc + y
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    """Returns the four multi-resolution feature maps (strides 4/8/16/32).

    ``remat=True`` rematerializes each HighResolutionModule in the backward
    pass (jax.checkpoint): ~2.5x lower activation memory for ~25% more
    FLOPs — the XLA-native replacement for the reference's InPlace-ABN
    memory trick (SURVEY.md §2.10).
    """

    spec: HRNetSpec
    dtype: Any = jnp.float32
    remat: bool = False
    # Checkpoint only the stem + layer1 (the high-resolution, low-FLOP
    # prefix): frees ~1.9 GB of batch-8 activations for ~1 TFLOP of
    # recompute, which stops XLA's HLO rematerializer from replaying the
    # 2.4-TFLOP cls_head conv instead (profiled: 3x convert_reduce_fusion
    # at 14.6 ms each).  Cheaper than remat=True (whole modules).
    remat_stem: bool = False
    # Which prefix the remat_stem checkpoint wraps: "stem_layer1" remats
    # both (max memory freed); "layer1" keeps the two full-resolution
    # stem activations saved (268 MB at batch 8) and recomputes only the
    # Bottleneck stack — the stem convs are the most bandwidth-hungry
    # part of the recompute, so this trades a little memory for cheaper
    # backward replay.
    remat_scope: str = "stem_layer1"
    # The reference's env-var flag layer (SURVEY.md §5 config), lifted
    # into the typed config tree:
    #   full_res_stem — single stride-1 stem conv, no conv2
    #     (hrnet_backbone.py:303-311,518-523); branch0 stays at full res.
    #   drop_stage4 — return the 3-branch stage3 features (:547-548).
    #   keep_imagenet_head — run the ImageNet classification head's
    #     incre/downsample/final modules over the 4 branches (:557-572,
    #     _make_head :361-411) so its pretrained weights stay usable.
    full_res_stem: bool = False
    drop_stage4: bool = False
    keep_imagenet_head: bool = False
    # Route small-channel 3x3 branch convs through the Pallas kernel
    # (ops/conv_pallas.py) — see ConvBN.pallas.
    pallas_conv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> list[jnp.ndarray]:
        s = self.spec

        def stem(mdl, x):
            if self.full_res_stem:
                x = ConvBN(s.stem_width, 3, 1, use_relu=True,
                           dtype=self.dtype, name="stem1")(x, train)
            else:
                x = ConvBN(s.stem_width, 3, 2, use_relu=True,
                           dtype=self.dtype, name="stem1")(x, train)
                x = ConvBN(s.stem_width, 3, 2, use_relu=True,
                           dtype=self.dtype, name="stem2")(x, train)
            return x

        def layer1(mdl, x):
            for k in range(s.stage1_blocks):
                x = Bottleneck(
                    s.stage1_width, downsample=(k == 0), dtype=self.dtype,
                    name=f"layer1_block{k}",
                )(x, train)
            return x

        def stem_and_layer1(mdl, x):
            return layer1(mdl, stem(mdl, x))

        if self.remat_stem and self.remat_scope == "stem_layer1":
            x = nn.remat(stem_and_layer1)(self, x)
        elif self.remat_stem and self.remat_scope == "layer1":
            x = nn.remat(layer1)(self, stem(self, x))
        elif self.remat_stem and self.remat_scope == "stem":
            x = layer1(self, nn.remat(stem)(self, x))
        else:
            x = stem_and_layer1(self, x)

        stages = [(2, s.stage2), (3, s.stage3)]
        if not self.drop_stage4:
            stages.append((4, s.stage4))
        xs = [x]
        for stage_idx, stage in stages:
            # Transition: adapt existing branches, spawn the new coarser one.
            new_xs = []
            for i, c in enumerate(stage.num_channels):
                if i < len(xs):
                    if xs[i].shape[-1] != c:
                        y = ConvBN(c, 3, 1, use_relu=True, dtype=self.dtype,
                                   name=f"transition{stage_idx}_b{i}")(xs[i], train)
                    else:
                        y = xs[i]
                else:
                    y = ConvBN(c, 3, 2, use_relu=True, dtype=self.dtype,
                               name=f"transition{stage_idx}_b{i}")(xs[-1], train)
                new_xs.append(y)
            xs = new_xs
            mod_cls = (
                nn.remat(HighResolutionModule, static_argnums=(2,))
                if self.remat else HighResolutionModule
            )
            for m in range(stage.num_modules):
                xs = mod_cls(
                    stage.num_channels, stage.num_blocks,
                    pallas_conv=self.pallas_conv, dtype=self.dtype,
                    name=f"stage{stage_idx}_module{m}",
                )(xs, train)

        if self.keep_imagenet_head and not self.drop_stage4:
            # _make_head (hrnet_backbone.py:361-411): raise each branch to
            # 128/256/512/1024 with one Bottleneck, cascade-downsample and
            # sum, then 1x1 -> 2048; x_list keeps the intermediate sums
            # with the last replaced by the 2048-wide final map (:557-572).
            head_width = (32, 64, 128, 256)
            ys = []
            y = Bottleneck(head_width[0], downsample=True, dtype=self.dtype,
                           name="incre0")(xs[0], train)
            ys.append(y)
            for i in range(1, len(xs)):
                inc = Bottleneck(head_width[i], downsample=True,
                                 dtype=self.dtype, name=f"incre{i}")(
                    xs[i], train)
                y = inc + ConvBN(head_width[i] * 4, 3, 2, use_relu=True,
                                 use_bias=True, dtype=self.dtype,
                                 name=f"downsamp{i - 1}")(y, train)
                ys.append(y)
            final = ConvBN(2048, 1, 1, use_relu=True, use_bias=True,
                           dtype=self.dtype, name="final_layer")(ys[-1], train)
            return ys[:-1] + [final]
        return xs


@dataclasses.dataclass(frozen=True)
class HRNextStage:
    num_modules: int
    num_blocks: int
    num_channels: tuple[int, ...]  # post-expansion widths
    block: str = "basic"


# hrnet2x20 (hrnet_config.py:140-175): stage1 is already 2 bottleneck
# branches; stages grow to 5 branches of width 20/40/80/160/320.
HRNEXT_SPECS: dict[str, tuple[HRNextStage, ...]] = {
    "hrnet2x20": (
        HRNextStage(1, 4, (128, 256), block="bottleneck"),
        HRNextStage(1, 4, (20, 40, 80)),
        HRNextStage(4, 4, (20, 40, 80, 160)),
        HRNextStage(3, 4, (20, 40, 80, 160, 320)),
    ),
}


class HRNetNext(nn.Module):
    """HighResolutionNext (hrnet_backbone.py:577-740): single stride-2
    stem, branch-parallel stage1, up to 5 branches.  Returns all branch
    feature maps (strides 2..32 for hrnet2x20)."""

    arch: str = "hrnet2x20"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> list[jnp.ndarray]:
        stages = HRNEXT_SPECS[self.arch]
        x = ConvBN(64, 3, 2, use_relu=True, dtype=self.dtype, name="stem")(
            x, train)
        xs = [x]
        for stage_idx, stage in enumerate(stages, start=1):
            new_xs = []
            for i, c in enumerate(stage.num_channels):
                if i < len(xs):
                    if xs[i].shape[-1] != c:
                        y = ConvBN(c, 3, 1, use_relu=True, dtype=self.dtype,
                                   name=f"transition{stage_idx}_b{i}")(xs[i], train)
                    else:
                        y = xs[i]
                else:
                    y = ConvBN(c, 3, 2, use_relu=True, dtype=self.dtype,
                               name=f"transition{stage_idx}_b{i}")(xs[-1], train)
                new_xs.append(y)
            xs = new_xs
            for m in range(stage.num_modules):
                xs = HighResolutionModule(
                    stage.num_channels, stage.num_blocks, block=stage.block,
                    dtype=self.dtype, name=f"stage{stage_idx}_module{m}",
                )(xs, train)
        return xs
