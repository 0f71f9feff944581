"""VGG backbone for WSOD (reference: projects/WSL/wsl/modeling/backbone/vgg.py
``build_vgg_backbone`` — VGG16 with dilated conv5, 'plain5' feature) and
MRRPConv (mrrp_conv.py:10 — multi-branch shared-weight dilated conv, the
Multi-Rate Region Pyramid; same idea as TridentNet's trident_conv)."""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import Conv2d, ShapeSpec
from ...modeling.backbone.backbone import Backbone
from ...modeling.backbone.build import BACKBONE_REGISTRY

Array = jax.Array

_VGG_CFGS = {
    16: [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512],
}


class VGG(Backbone):
    depth: int = 16
    conv5_dilation: int = 1
    out_features: Sequence[str] = ("plain5",)
    freeze_at: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        cfg_list = _VGG_CFGS[self.depth]
        outputs = {}
        stage = 1
        conv_idx = 1
        num_pools = 0
        for v in cfg_list:
            if v == "M":
                if num_pools < 3:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                elif num_pools == 3:
                    # the conv4->conv5 pool is removed when conv5 is dilated
                    if self.conv5_dilation == 1:
                        x = nn.max_pool(x, (2, 2), strides=(2, 2))
                num_pools += 1
                outputs[f"plain{stage}"] = x
                stage += 1
                conv_idx = 1
            else:
                dilation = self.conv5_dilation if stage == 5 else 1
                x = Conv2d(
                    features=v,
                    kernel_size=3,
                    padding=dilation,
                    dilation=dilation,
                    activation=nn.relu,
                    dtype=self.dtype,
                    name=f"conv{stage}_{conv_idx}",
                )(x)
                conv_idx += 1
        outputs[f"plain{stage}"] = x
        if self.freeze_at > 0:
            for k in list(outputs):
                lvl = int(k[-1])
                if lvl <= self.freeze_at:
                    outputs[k] = jax.lax.stop_gradient(outputs[k])
        return {k: v for k, v in outputs.items() if k in self.out_features}

    def output_shape(self) -> Dict[str, ShapeSpec]:
        strides = {"plain1": 2, "plain2": 4, "plain3": 8, "plain4": 8, "plain5": 8}
        if self.conv5_dilation == 1:
            strides["plain4"] = 8
            strides["plain5"] = 16
        channels = {"plain1": 64, "plain2": 128, "plain3": 256, "plain4": 512, "plain5": 512}
        return {
            f: ShapeSpec(channels=channels[f], stride=strides[f]) for f in self.out_features
        }

    @property
    def size_divisibility(self) -> int:
        return 16


@BACKBONE_REGISTRY.register()
def build_vgg_backbone(cfg: CfgNode, input_shape: ShapeSpec) -> VGG:
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return VGG(
        depth=cfg.MODEL.VGG.DEPTH,
        conv5_dilation=cfg.MODEL.VGG.CONV5_DILATION,
        out_features=tuple(cfg.MODEL.VGG.OUT_FEATURES),
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        dtype=dtype,
    )


class MRRPVGG(VGG):
    """VGG whose ``mrrp_stage`` (plain5) runs as a Multi-Rate Region Pyramid:
    the stage's convs share ONE set of weights across ``mrrp_num_branch``
    branches with different dilations; branch outputs are folded into the
    batch axis like MRRPWSLResNet (reference vgg_mrrp.py:13
    ``build_mrrp_vgg_backbone``, config MODEL.MRRP.*)."""

    mrrp_num_branch: int = 3
    mrrp_dilations: Sequence[int] = (1, 2, 4)
    mrrp_stage: str = "plain5"
    mrrp_test_branch_idx: int = -1  # -1 = keep all branches at test time

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Dict[str, Array]:
        cfg_list = _VGG_CFGS[self.depth]
        outputs = {}
        stage = 1
        conv_idx = 1
        num_pools = 0
        if train or self.mrrp_test_branch_idx < 0:
            dils = list(self.mrrp_dilations)[: self.mrrp_num_branch]
        else:
            dils = [self.mrrp_dilations[self.mrrp_test_branch_idx]]
        xs = [x] * len(dils) if self.mrrp_stage == "plain1" else [x]
        for v in cfg_list:
            if v == "M":
                if num_pools < 3 or (num_pools == 3 and self.conv5_dilation == 1):
                    xs = [nn.max_pool(b, (2, 2), strides=(2, 2)) for b in xs]
                num_pools += 1
                outputs[f"plain{stage}"] = xs[0] if len(xs) == 1 else jnp.concatenate(xs, 0)
                stage += 1
                conv_idx = 1
                if f"plain{stage}" == self.mrrp_stage:
                    xs = xs * len(dils)
            else:
                if f"plain{stage}" == self.mrrp_stage:
                    # shared-weight multi-dilation conv over the branch list;
                    # the stage's base dilation (conv5_dilation) multiplies
                    # the per-branch rates like the reference's trident convs
                    base = self.conv5_dilation if stage == 5 else 1
                    xs = MRRPConv(
                        features=v,
                        kernel_size=3,
                        num_branch=len(xs),
                        dilations=tuple(base * d for d in dils),
                        test_branch_idx=-1,  # branch selection handled above
                        use_bias=True,
                        dtype=self.dtype,
                        name=f"conv{stage}_{conv_idx}",
                    )(xs, train=True)
                    xs = [nn.relu(b) for b in xs]
                else:
                    dilation = self.conv5_dilation if stage == 5 else 1
                    xs = [
                        Conv2d(
                            features=v,
                            kernel_size=3,
                            padding=dilation,
                            dilation=dilation,
                            activation=nn.relu,
                            dtype=self.dtype,
                            name=f"conv{stage}_{conv_idx}",
                        )(b)
                        for b in xs
                    ]
                conv_idx += 1
        outputs[f"plain{stage}"] = xs[0] if len(xs) == 1 else jnp.concatenate(xs, 0)
        if self.freeze_at > 0:
            for k in list(outputs):
                if int(k[-1]) <= self.freeze_at:
                    outputs[k] = jax.lax.stop_gradient(outputs[k])
        return {k: v for k, v in outputs.items() if k in self.out_features}


@BACKBONE_REGISTRY.register()
def build_mrrp_vgg_backbone(cfg: CfgNode, input_shape: ShapeSpec) -> MRRPVGG:
    """Reference wsl/modeling/backbone/vgg_mrrp.py (config MODEL.MRRP.*)."""
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return MRRPVGG(
        depth=cfg.MODEL.VGG.DEPTH,
        conv5_dilation=cfg.MODEL.VGG.CONV5_DILATION,
        out_features=tuple(cfg.MODEL.VGG.OUT_FEATURES),
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        dtype=dtype,
        mrrp_num_branch=cfg.MODEL.MRRP.NUM_BRANCH,
        mrrp_dilations=tuple(cfg.MODEL.MRRP.BRANCH_DILATIONS),
        mrrp_stage=cfg.MODEL.MRRP.MRRP_STAGE,
        mrrp_test_branch_idx=cfg.MODEL.MRRP.TEST_BRANCH_IDX,
    )


class MRRPConv(nn.Module):
    """Multi-Rate Region Pyramid conv: ONE weight shared across branches
    with different dilations (reference mrrp_conv.py:10). Input/output are
    lists of per-branch tensors."""

    features: int
    kernel_size: int = 3
    num_branch: int = 3
    dilations: Sequence[int] = (1, 2, 3)
    test_branch_idx: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: List[Array], train: bool = True) -> List[Array]:
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (self.kernel_size, self.kernel_size, inputs[0].shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )

        def run(x, dilation):
            pad = dilation * (self.kernel_size - 1) // 2
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(1, 1),
                padding=((pad, pad), (pad, pad)),
                rhs_dilation=(dilation, dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y

        if train or self.test_branch_idx == -1:
            branches = self.dilations[: self.num_branch]
            if len(inputs) == 1:
                inputs = inputs * self.num_branch
            return [run(x, d) for x, d in zip(inputs, branches)]
        d = self.dilations[self.test_branch_idx]
        return [run(inputs[0], d)]
