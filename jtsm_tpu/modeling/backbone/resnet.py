"""ResNet backbone, TPU-native (NHWC, bf16 compute, FrozenBN fused multiply-add).

Reference: detectron2/modeling/backbone/resnet.py:33 (``BasicBlock``), :101
(``BottleneckBlock`` with ``stride_in_1x1``), :331 (``BasicStem``), :362
(``ResNet`` with ``freeze(at)``), :563 (``build_resnet_backbone``).

Freezing re-design: the reference mutates ``requires_grad``; here frozen
stages are wrapped in ``jax.lax.stop_gradient`` at their outputs, which
zeroes every upstream gradient — the functional equivalent.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import Conv2d, ShapeSpec, get_norm
from .backbone import Backbone
from .build import BACKBONE_REGISTRY

Array = jax.Array


class BasicStem(nn.Module):
    out_channels: int = 64
    norm: str = "FrozenBN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv2d(
            features=self.out_channels,
            kernel_size=7,
            stride=2,
            padding=3,
            use_bias=False,
            norm=self.norm,
            activation=nn.relu,
            dtype=self.dtype,
            name="conv1",
        )(x)
        # 3x3 max pool stride 2, torch-style padding=1
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x

    @property
    def stride(self) -> int:
        return 4


class BasicBlock(nn.Module):
    """Two 3x3 convs (R18/R34). Reference resnet.py:33."""

    in_channels: int
    out_channels: int
    stride: int = 1
    norm: str = "FrozenBN"
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, dilation: int = 0) -> Array:
        # call-time dilation override: lets MRRP/Trident-style backbones run
        # the SAME block (shared weights) at several rates (kernel shapes do
        # not depend on dilation, so flax param sharing is exact)
        d = dilation or self.dilation
        out = Conv2d(
            features=self.out_channels,
            kernel_size=3,
            stride=self.stride,
            padding=d,
            dilation=d,
            use_bias=False,
            norm=self.norm,
            activation=nn.relu,
            dtype=self.dtype,
            name="conv1",
        )(x)
        out = Conv2d(
            features=self.out_channels,
            kernel_size=3,
            stride=1,
            padding=d,
            dilation=d,
            use_bias=False,
            norm=self.norm,
            dtype=self.dtype,
            name="conv2",
        )(out)
        if self.in_channels != self.out_channels or self.stride != 1:
            shortcut = Conv2d(
                features=self.out_channels,
                kernel_size=1,
                stride=self.stride,
                use_bias=False,
                norm=self.norm,
                dtype=self.dtype,
                name="shortcut",
            )(x)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 with optional dilation/groups. Reference resnet.py:101."""

    in_channels: int
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    num_groups: int = 1
    norm: str = "FrozenBN"
    stride_in_1x1: bool = True
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, dilation: int = 0) -> Array:
        d = dilation or self.dilation  # call-time override (MRRP sharing)
        stride_1x1, stride_3x3 = (
            (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        )
        out = Conv2d(
            features=self.bottleneck_channels,
            kernel_size=1,
            stride=stride_1x1,
            use_bias=False,
            norm=self.norm,
            activation=nn.relu,
            dtype=self.dtype,
            name="conv1",
        )(x)
        out = Conv2d(
            features=self.bottleneck_channels,
            kernel_size=3,
            stride=stride_3x3,
            padding=d,
            dilation=d,
            groups=self.num_groups,
            use_bias=False,
            norm=self.norm,
            activation=nn.relu,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = Conv2d(
            features=self.out_channels,
            kernel_size=1,
            use_bias=False,
            norm=self.norm,
            dtype=self.dtype,
            name="conv3",
        )(out)
        if self.in_channels != self.out_channels or self.stride != 1:
            shortcut = Conv2d(
                features=self.out_channels,
                kernel_size=1,
                stride=self.stride,
                use_bias=False,
                norm=self.norm,
                dtype=self.dtype,
                name="shortcut",
            )(x)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


class DeformBottleneckBlock(nn.Module):
    """Bottleneck with a deformable 3x3 conv2 (reference resnet.py:214)."""

    in_channels: int
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    num_groups: int = 1
    norm: str = "FrozenBN"
    stride_in_1x1: bool = True
    dilation: int = 1
    deform_modulated: bool = False
    deform_num_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ...layers import DeformConv, ModulatedDeformConv
        from ...layers.batch_norm import get_norm

        stride_1x1, stride_3x3 = (
            (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        )
        out = Conv2d(
            features=self.bottleneck_channels,
            kernel_size=1,
            stride=stride_1x1,
            use_bias=False,
            norm=self.norm,
            activation=nn.relu,
            dtype=self.dtype,
            name="conv1",
        )(x)

        offset_channels = 27 if self.deform_modulated else 18
        offset_out = Conv2d(
            features=offset_channels * self.deform_num_groups,
            kernel_size=3,
            stride=stride_3x3,
            padding=self.dilation,
            dilation=self.dilation,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="conv2_offset",
        )(out)
        if stride_3x3 > 1:
            out_strided = out[:, ::stride_3x3, ::stride_3x3]
        else:
            out_strided = out
        if self.deform_modulated:
            offsets = offset_out[..., :18]
            mask = offset_out[..., 18:27]
            dc = ModulatedDeformConv(
                features=self.bottleneck_channels,
                kernel_size=3,
                stride=1,
                dilation=self.dilation,
                dtype=self.dtype,
                name="conv2",
            )(out_strided, offsets, mask)
        else:
            dc = DeformConv(
                features=self.bottleneck_channels,
                kernel_size=3,
                stride=1,
                dilation=self.dilation,
                dtype=self.dtype,
                name="conv2",
            )(out_strided, offset_out)
        out = get_norm(self.norm, self.bottleneck_channels, name="conv2_norm")(dc)
        out = nn.relu(out)
        out = Conv2d(
            features=self.out_channels,
            kernel_size=1,
            use_bias=False,
            norm=self.norm,
            dtype=self.dtype,
            name="conv3",
        )(out)
        if self.in_channels != self.out_channels or self.stride != 1:
            shortcut = Conv2d(
                features=self.out_channels,
                kernel_size=1,
                stride=self.stride,
                use_bias=False,
                norm=self.norm,
                dtype=self.dtype,
                name="shortcut",
            )(x)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


_DEPTH_TO_BLOCKS = {
    18: [2, 2, 2, 2],
    34: [3, 4, 6, 3],
    50: [3, 4, 6, 3],
    101: [3, 4, 23, 3],
    152: [3, 8, 36, 3],
}


class ResNet(Backbone):
    """Reference resnet.py:362. Stage specs are derived from config fields so
    ``output_shape`` is static."""

    depth: int = 50
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    norm: str = "FrozenBN"
    out_features: Sequence[str] = ("res4",)
    freeze_at: int = 2
    deform_on_per_stage: Sequence[bool] = (False, False, False, False)
    deform_modulated: bool = False
    deform_num_groups: int = 1
    stem_type: str = "basic"  # "basic" (7x7) | "deeplab" (3x 3x3) | "wsl" (maxpool variant)
    # rematerialize each residual block on the backward pass (jax.checkpoint):
    # block intermediates are recomputed instead of stored, trading ~one extra
    # forward for activation memory — the backbone dominates activation HBM at
    # detection image sizes, so this is the lever for larger per-chip batches
    # (cfg TPU.REMAT scope "backbone_blocks")
    remat: bool = False
    dtype: Any = jnp.float32

    def make_stem(self):
        """Subclass hook (DeepLab/WSL resnets override the stem)."""
        return BasicStem(
            out_channels=self.stem_out_channels, norm=self.norm, dtype=self.dtype
        )

    def setup(self):
        assert self.depth in _DEPTH_TO_BLOCKS, self.depth
        assert self.res5_dilation in (1, 2), self.res5_dilation
        self.stem = self.make_stem()
        num_blocks_per_stage = _DEPTH_TO_BLOCKS[self.depth]

        # which stages are needed given out_features
        out_stage_idx = [
            {"res2": 2, "res3": 3, "res4": 4, "res5": 5}[f]
            for f in self.out_features
            if f != "stem"
        ]
        max_stage = max(out_stage_idx) if out_stage_idx else 2

        is_basic = self.depth in (18, 34)
        if is_basic:
            # reference resnet.py:604 — basic-block depths have fixed
            # 64-wide res2; reject silently-ignored narrower settings
            assert self.res2_out_channels == 64, (
                "Must set MODEL.RESNETS.RES2_OUT_CHANNELS = 64 for R18/R34"
            )
        in_channels = self.stem_out_channels
        out_channels = self.res2_out_channels if not is_basic else 64
        bottleneck_channels = self.num_groups * self.width_per_group

        stages = []
        stage_names = []
        for idx, stage_idx in enumerate(range(2, max_stage + 1)):
            dilation = self.res5_dilation if stage_idx == 5 else 1
            first_stride = 1 if idx == 0 or (stage_idx == 5 and dilation == 2) else 2
            blocks = []
            for b in range(num_blocks_per_stage[idx]):
                stride = first_stride if b == 0 else 1
                if is_basic:
                    blocks.append(
                        BasicBlock(
                            in_channels=in_channels,
                            out_channels=out_channels,
                            stride=stride,
                            norm=self.norm,
                            dtype=self.dtype,
                            name=f"res{stage_idx}_block{b}",
                        )
                    )
                else:
                    block_cls = (
                        DeformBottleneckBlock
                        if (
                            idx < len(self.deform_on_per_stage)
                            and self.deform_on_per_stage[idx]
                        )
                        else BottleneckBlock
                    )
                    kwargs = dict(
                        in_channels=in_channels,
                        out_channels=out_channels,
                        bottleneck_channels=bottleneck_channels,
                        stride=stride,
                        num_groups=self.num_groups,
                        norm=self.norm,
                        stride_in_1x1=self.stride_in_1x1,
                        dilation=dilation,
                        dtype=self.dtype,
                        name=f"res{stage_idx}_block{b}",
                    )
                    if block_cls is DeformBottleneckBlock:
                        kwargs.update(
                            deform_modulated=self.deform_modulated,
                            deform_num_groups=self.deform_num_groups,
                        )
                    blocks.append(block_cls(**kwargs))
                in_channels = out_channels
            stages.append(blocks)
            stage_names.append(f"res{stage_idx}")
            out_channels *= 2
            bottleneck_channels *= 2
        self.stages = stages
        self._stage_names = stage_names

    def __call__(self, x: Array) -> Dict[str, Array]:
        outputs = {}
        x = self.stem(x)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)
        if "stem" in self.out_features:
            outputs["stem"] = x
        for i, (name, blocks) in enumerate(zip(self._stage_names, self.stages)):
            # frozen stages carry no backward pass (stop_gradient below), so
            # rematting them would only add recompute for nothing
            use_remat = self.remat and self.freeze_at < i + 2
            for block in blocks:
                if use_remat:
                    x = nn.remat(lambda mdl, y: mdl(y))(block, x)
                else:
                    x = block(x)
            if self.freeze_at >= i + 2:
                x = jax.lax.stop_gradient(x)
            if name in self.out_features:
                outputs[name] = x
        return outputs

    def output_shape(self) -> Dict[str, ShapeSpec]:
        strides = {"stem": 4, "res2": 4, "res3": 8, "res4": 16, "res5": 32}
        if self.res5_dilation == 2:
            strides["res5"] = 16
        is_basic = self.depth in (18, 34)
        base = 64 if is_basic else self.res2_out_channels
        channels = {
            "stem": self.stem_out_channels,
            "res2": base,
            "res3": base * 2,
            "res4": base * 4,
            "res5": base * 8,
        }
        return {
            f: ShapeSpec(channels=channels[f], stride=strides[f])
            for f in self.out_features
        }

    @property
    def size_divisibility(self) -> int:
        return 32


@BACKBONE_REGISTRY.register()
def build_resnet_backbone(cfg: CfgNode, input_shape: ShapeSpec) -> ResNet:
    """Reference resnet.py:563."""
    if cfg.MODEL.RESNETS.DEPTH in (18, 34):
        # reference resnet.py:604 — basic-block depths have fixed 64-wide
        # res2; reject silently-ignored narrower settings at build time
        assert cfg.MODEL.RESNETS.RES2_OUT_CHANNELS == 64, (
            "Must set MODEL.RESNETS.RES2_OUT_CHANNELS = 64 for R18/R34"
        )
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return ResNet(
        depth=cfg.MODEL.RESNETS.DEPTH,
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
        width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        res5_dilation=cfg.MODEL.RESNETS.RES5_DILATION,
        norm=cfg.MODEL.RESNETS.NORM,
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        deform_on_per_stage=tuple(cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE),
        deform_modulated=cfg.MODEL.RESNETS.DEFORM_MODULATED,
        deform_num_groups=cfg.MODEL.RESNETS.DEFORM_NUM_GROUPS,
        remat="backbone_blocks" in cfg.TPU.REMAT,
        dtype=dtype,
    )


def make_stage(block_class, num_blocks, *, in_channels, out_channels, first_stride=1, name_prefix="block", **kwargs):
    """Reference resnet.py ``ResNet.make_stage``: a list of ``num_blocks``
    blocks where the first carries ``first_stride`` and the rest stride 1,
    channels chained in -> out. For custom backbones composing their own
    stages (the built-in ResNet builds stages in ``setup``)."""
    blocks = []
    for b in range(num_blocks):
        blocks.append(
            block_class(
                in_channels=in_channels if b == 0 else out_channels,
                out_channels=out_channels,
                stride=first_stride if b == 0 else 1,
                name=f"{name_prefix}{b}",
                **kwargs,
            )
        )
    return blocks
