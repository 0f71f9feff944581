"""Trident ResNet backbone (reference:
projects/TridentNet/tridentnet/trident_backbone.py:15,132).

The res4 stage runs N weight-shared branches with different dilations;
branch outputs are stacked into the batch dimension (B*N images) so the
downstream RPN/RCNN run unchanged — the reference's TridentRPN does exactly
this batch-duplication."""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from jtsm_tpu.config import CfgNode
from jtsm_tpu.layers import ShapeSpec
from jtsm_tpu.modeling.backbone.backbone import Backbone
from jtsm_tpu.modeling.backbone.build import BACKBONE_REGISTRY
from jtsm_tpu.modeling.backbone.resnet import ResNet, build_resnet_backbone
from jtsm_tpu.wsl.modeling.vgg import MRRPConv

Array = jax.Array


class TridentBlock(nn.Module):
    """Bottleneck whose 3x3 conv is an MRRPConv over branches."""

    in_channels: int
    out_channels: int
    bottleneck_channels: int
    num_branch: int = 3
    dilations: Sequence[int] = (1, 2, 3)
    test_branch_idx: int = 1
    stride: int = 1
    norm: str = "FrozenBN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        from jtsm_tpu.layers import Conv2d
        from jtsm_tpu.layers.batch_norm import get_norm

        if not isinstance(inputs, (list, tuple)):
            inputs = [inputs] * (self.num_branch if train else 1)

        conv1 = Conv2d(
            features=self.bottleneck_channels,
            kernel_size=1,
            stride=self.stride,
            use_bias=False,
            norm=self.norm,
            activation=nn.relu,
            dtype=self.dtype,
            name="conv1",
        )
        mrrp = MRRPConv(
            features=self.bottleneck_channels,
            kernel_size=3,
            num_branch=self.num_branch,
            dilations=self.dilations,
            test_branch_idx=self.test_branch_idx,
            dtype=self.dtype,
            name="conv2",
        )
        norm2 = get_norm(self.norm, self.bottleneck_channels, name="conv2_norm")
        conv3 = Conv2d(
            features=self.out_channels,
            kernel_size=1,
            use_bias=False,
            norm=self.norm,
            dtype=self.dtype,
            name="conv3",
        )
        need_shortcut = self.in_channels != self.out_channels or self.stride != 1
        shortcut_conv = (
            Conv2d(
                features=self.out_channels,
                kernel_size=1,
                stride=self.stride,
                use_bias=False,
                norm=self.norm,
                dtype=self.dtype,
                name="shortcut",
            )
            if need_shortcut
            else None
        )

        mids = [conv1(x) for x in inputs]
        mids = mrrp(mids, train=train)
        if len(mids) > len(inputs):
            # MRRPConv expanded 1 -> num_branch (test_branch_idx == -1 at
            # inference): replicate the residual input per branch too
            inputs = list(inputs) * (len(mids) // len(inputs))
        outs = []
        for x_in, m in zip(inputs, mids):
            y = nn.relu(norm2(m))
            y = conv3(y)
            sc = shortcut_conv(x_in) if shortcut_conv is not None else x_in
            outs.append(nn.relu(y + sc))
        return outs


class TridentResNet(Backbone):
    """R-C4 backbone with a trident res4: output 'res4' has the branch dim
    folded into batch at train time ((B*N, H, W, C))."""

    bottom: ResNet  # runs stem..res3
    num_branch: int = 3
    dilations: Sequence[int] = (1, 2, 3)
    test_branch_idx: int = 1
    num_blocks: int = 6
    norm: str = "FrozenBN"
    res4_in_channels: int = 512
    res4_out_channels: int = 1024
    bottleneck_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Dict[str, Array]:
        feats = self.bottom(x)
        y = feats["res3"]
        cur = [y] * (self.num_branch if train else 1)
        in_c = self.res4_in_channels
        for b in range(self.num_blocks):
            cur = TridentBlock(
                in_channels=in_c,
                out_channels=self.res4_out_channels,
                bottleneck_channels=self.bottleneck_channels,
                num_branch=self.num_branch,
                dilations=self.dilations,
                test_branch_idx=self.test_branch_idx,
                stride=2 if b == 0 else 1,
                norm=self.norm,
                dtype=self.dtype,
                name=f"res4_block{b}",
            )(cur, train=train)
            in_c = self.res4_out_channels
        # fold branches into batch: (N*B, H, W, C)
        out = jnp.concatenate(cur, axis=0)
        return {"res4": out}

    def output_shape(self) -> Dict[str, ShapeSpec]:
        return {"res4": ShapeSpec(channels=self.res4_out_channels, stride=16)}

    @property
    def size_divisibility(self) -> int:
        return 32


@BACKBONE_REGISTRY.register()
def build_trident_resnet_backbone(cfg: CfgNode, input_shape: ShapeSpec) -> TridentResNet:
    sub = cfg.clone()
    sub.defrost()
    sub.MODEL.RESNETS.OUT_FEATURES = ["res3"]
    bottom = build_resnet_backbone(sub, input_shape)
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    width = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS
    return TridentResNet(
        bottom=bottom,
        num_branch=cfg.MODEL.TRIDENT.NUM_BRANCH,
        dilations=tuple(cfg.MODEL.TRIDENT.BRANCH_DILATIONS),
        test_branch_idx=cfg.MODEL.TRIDENT.TEST_BRANCH_IDX,
        num_blocks={50: 6, 101: 23}.get(cfg.MODEL.RESNETS.DEPTH, 6),
        norm=cfg.MODEL.RESNETS.NORM,
        res4_in_channels=width * 2,
        res4_out_channels=width * 4,
        bottleneck_channels=cfg.MODEL.RESNETS.NUM_GROUPS
        * cfg.MODEL.RESNETS.WIDTH_PER_GROUP
        * 4,
        dtype=dtype,
    )
