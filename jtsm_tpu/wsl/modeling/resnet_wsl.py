"""WS-ResNet backbones for WSOD (reference:
projects/WSL/wsl/modeling/backbone/resnet_wsl.py:631
``build_wsl_resnet_backbone`` and resnet_wsl_v2.py:749 — the DRN-WSOD
pretrained 'WSR' variants whose stem max-pools differently, plus the
MRRP multi-branch variant resnet_wsl_mrrp.py:1033."""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import Conv2d, ShapeSpec
from ...modeling.backbone.build import BACKBONE_REGISTRY
from ...modeling.backbone.resnet import BasicStem, ResNet

Array = jax.Array


class WSLStem(nn.Module):
    """7x7 conv stride 2 + 2x2 max pool stride 2 (the DRN-WSOD stem; the
    standard stem uses a 3x3 pool with padding)."""

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
        return nn.max_pool(x, (2, 2), strides=(2, 2))

    @property
    def stride(self) -> int:
        return 4


class WSLResNet(ResNet):
    def make_stem(self):
        return WSLStem(
            out_channels=self.stem_out_channels, norm=self.norm, dtype=self.dtype
        )


@BACKBONE_REGISTRY.register()
def build_wsl_resnet_backbone(cfg: CfgNode, input_shape: ShapeSpec) -> WSLResNet:
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return WSLResNet(
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
        remat="backbone_blocks" in cfg.TPU.REMAT,
        dtype=dtype,
    )


# the reference registers a v2 builder with identical config surface
@BACKBONE_REGISTRY.register()
def build_wsl_resnet_v2_backbone(cfg: CfgNode, input_shape: ShapeSpec) -> WSLResNet:
    return build_wsl_resnet_backbone(cfg, input_shape)


class MRRPWSLResNet(WSLResNet):
    """WS-ResNet whose ``mrrp_stage`` runs as a Multi-Rate Region Pyramid:
    ``num_branch`` weight-SHARED copies of the stage at different dilations,
    folded into the batch dimension (B*num_branch images), matching the
    reference resnet_wsl_mrrp.py:1033 / TridentNet semantics. Downstream WSL
    RPN/heads unfold the branches (see rpn_wsl.py)."""

    mrrp_num_branch: int = 3
    mrrp_dilations: Sequence[int] = (1, 2, 3)
    mrrp_stage: str = "res5"
    mrrp_test_branch_idx: int = -1  # -1 = keep all branches at test time

    def __call__(self, x: Array, train: bool = True) -> Dict[str, Array]:
        outputs: Dict[str, Array] = {}
        x = self.stem(x)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)
        if "stem" in self.out_features:
            outputs["stem"] = x

        branched = False
        xs = [x]
        for i, (name, blocks) in enumerate(zip(self._stage_names, self.stages)):
            use_remat = self.remat and self.freeze_at < i + 2

            def run(block, b, d=None):
                if use_remat:
                    if d is None:
                        return nn.remat(lambda mdl, y: mdl(y))(block, b)
                    # dilation is a Python static: close over it so only
                    # arrays cross the remat boundary
                    return nn.remat(lambda mdl, y: mdl(y, dilation=d))(block, b)
                return block(b) if d is None else block(b, dilation=d)

            if name == self.mrrp_stage and not branched:
                branched = True
                if train or self.mrrp_test_branch_idx < 0:
                    dilations = list(self.mrrp_dilations)[: self.mrrp_num_branch]
                else:
                    dilations = [self.mrrp_dilations[self.mrrp_test_branch_idx]]
                xs = [xs[0]] * len(dilations)
                for block in blocks:
                    xs = [run(block, b, d) for b, d in zip(xs, dilations)]
            else:
                for block in blocks:
                    xs = [run(block, b) for b in xs]
            if self.freeze_at >= i + 2:
                xs = [jax.lax.stop_gradient(b) for b in xs]
            if name in self.out_features:
                outputs[name] = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=0)
        return outputs


@BACKBONE_REGISTRY.register()
def build_mrrp_wsl_resnet_backbone(cfg: CfgNode, input_shape: ShapeSpec) -> MRRPWSLResNet:
    """Reference wsl/modeling/backbone/resnet_wsl_mrrp.py (config MODEL.MRRP.*)."""
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return MRRPWSLResNet(
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
        remat="backbone_blocks" in cfg.TPU.REMAT,
        mrrp_num_branch=cfg.MODEL.MRRP.NUM_BRANCH,
        mrrp_dilations=tuple(cfg.MODEL.MRRP.BRANCH_DILATIONS),
        mrrp_stage=cfg.MODEL.MRRP.MRRP_STAGE,
        mrrp_test_branch_idx=cfg.MODEL.MRRP.TEST_BRANCH_IDX,
        dtype=dtype,
    )


@BACKBONE_REGISTRY.register()
def build_wsl_resnet_fpn_backbone(cfg: CfgNode, input_shape: ShapeSpec):
    """FPN over the WS-ResNet trunk (reference wsl backbone registry name
    used by faster_rcnn_WSR_*_FPN.yaml): the bottom-up emits res2..res5
    regardless of the DC5 OUT_FEATURES setting."""
    from ...modeling.backbone.fpn import FPN, LastLevelMaxPool

    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    bottom_up = WSLResNet(
        depth=cfg.MODEL.RESNETS.DEPTH,
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
        width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        res5_dilation=1,
        norm=cfg.MODEL.RESNETS.NORM,
        out_features=("res2", "res3", "res4", "res5"),
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        remat="backbone_blocks" in cfg.TPU.REMAT,
        dtype=dtype,
    )
    return FPN(
        bottom_up=bottom_up,
        in_features=tuple(cfg.MODEL.FPN.IN_FEATURES),
        out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        norm=cfg.MODEL.FPN.NORM,
        top_block=LastLevelMaxPool(),
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        dtype=dtype,
    )


# Two shipped reference yamls name backbone builders the reference never
# defines, so they crash upstream: PascalVOC-Detection/wsddn_R_18_DC5_1x.yaml
# asks for "build_resnet_18_backbone" (no such symbol anywhere; DEPTH: 18 is
# already in the config, so the plain builder is what was meant) and
# reg_all/oicr_TRD_WSR_50_DC5_1x.yaml asks for "build_wsl_mrrp_resnet_backbone"
# (a transposition of resnet_wsl_mrrp.py:906 build_mrrp_wsl_resnet_backbone).
# Register both intended targets under the literal yaml names so those
# configs load here verbatim.
@BACKBONE_REGISTRY.register()
def build_resnet_18_backbone(cfg: CfgNode, input_shape: ShapeSpec):
    from ...modeling.backbone.resnet import build_resnet_backbone

    return build_resnet_backbone(cfg, input_shape)


@BACKBONE_REGISTRY.register()
def build_wsl_mrrp_resnet_backbone(cfg: CfgNode, input_shape: ShapeSpec) -> MRRPWSLResNet:
    return build_mrrp_wsl_resnet_backbone(cfg, input_shape)
