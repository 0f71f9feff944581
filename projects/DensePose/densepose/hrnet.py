"""HRNet backbone + HRFPN neck (DensePose's alternative backbone).

Reference: projects/DensePose/densepose/modeling/hrnet.py:474 (PoseHigher-
ResolutionNet) and hrfpn.py (HRFPN neck, arXiv:1904.04514). TPU re-design:

* parallel multi-resolution branches are plain NHWC convs — XLA fuses the
  BN+ReLU chains; the cross-resolution "exchange units" use strided 3x3
  convs downward and 1x1 conv + ``jax.image.resize`` upward (the reference's
  deconv-based interp was a deployment workaround for ONNX, not a numerics
  choice).
* HRFPN concatenates all branches at 1/4 resolution and produces each
  pyramid level with ONE stride-2^i conv (fused reduction+pooling, as the
  reference's "custom change" does), then a 3x3 output conv.

Branch/stage topology comes from ``cfg.MODEL.HRNET.*`` (same key tree as
the reference, config.py:179-207).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

import flax.linen as nn
from jtsm_tpu.config import CfgNode
from jtsm_tpu.layers import Conv2d, ShapeSpec, get_norm
from jtsm_tpu.modeling.backbone.backbone import Backbone
from jtsm_tpu.modeling.backbone.build import BACKBONE_REGISTRY
from jtsm_tpu.modeling.backbone.resnet import BasicBlock, BottleneckBlock

Array = jax.Array


class _Branch(nn.Module):
    """A run of BasicBlocks at one resolution."""

    channels: int
    num_blocks: int
    norm: str
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for b in range(self.num_blocks):
            x = BasicBlock(
                in_channels=x.shape[-1],
                out_channels=self.channels,
                norm=self.norm,
                dtype=self.dtype,
                name=f"block{b}",
            )(x)
        return x


class _FuseInto(nn.Module):
    """Exchange unit: transform branch j's features to branch i's shape."""

    src: int
    dst: int
    channels: int  # target branch channels
    norm: str
    dtype: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.src == self.dst:
            return x
        if self.src > self.dst:
            # lower-resolution -> higher: 1x1 channel match + upsample
            x = Conv2d(
                self.channels, kernel_size=1, use_bias=False, norm=self.norm,
                dtype=self.dtype, name="up_conv",
            )(x)
            scale = 2 ** (self.src - self.dst)
            n, h, w, c = x.shape
            return jax.image.resize(
                x, (n, h * scale, w * scale, c), "nearest"
            ).astype(x.dtype)
        # higher-resolution -> lower: chain of stride-2 3x3 convs; only the
        # last changes channels (reference hrnet.py fuse_layers)
        steps = self.dst - self.src
        for s in range(steps):
            last = s == steps - 1
            x = Conv2d(
                self.channels if last else x.shape[-1],
                kernel_size=3,
                stride=2,
                padding=1,
                use_bias=False,
                norm=self.norm,
                activation=None if last else nn.relu,
                dtype=self.dtype,
                name=f"down{s}",
            )(x)
        return x


class _Stage(nn.Module):
    """num_modules x (parallel branches + full fusion)."""

    num_modules: int
    num_blocks: Sequence[int]
    channels: Sequence[int]
    norm: str
    dtype: Any

    @nn.compact
    def __call__(self, xs: List[Array]) -> List[Array]:
        nb = len(self.channels)
        for m in range(self.num_modules):
            ys = [
                _Branch(
                    self.channels[i], self.num_blocks[i], self.norm, self.dtype,
                    name=f"m{m}_branch{i}",
                )(xs[i])
                for i in range(nb)
            ]
            fused = []
            for i in range(nb):
                acc = None
                for j in range(nb):
                    t = _FuseInto(
                        j, i, self.channels[i], self.norm, self.dtype,
                        name=f"m{m}_fuse{j}to{i}",
                    )(ys[j])
                    acc = t if acc is None else acc + t
                fused.append(nn.relu(acc))
            xs = fused
        return xs


class HRNet(Backbone):
    """Outputs {"hr1": 1/4, "hr2": 1/8, "hr3": 1/16, "hr4": 1/32}."""

    stem_inplanes: int = 64
    stage_num_modules: Tuple[int, ...] = (1, 4, 3)
    stage_num_blocks: Tuple[Tuple[int, ...], ...] = ((4, 4), (4, 4, 4), (4, 4, 4, 4))
    stage_channels: Tuple[Tuple[int, ...], ...] = (
        (32, 64),
        (32, 64, 128),
        (32, 64, 128, 256),
    )
    norm: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        x = x.astype(self.dtype)
        for i in (1, 2):
            x = Conv2d(
                self.stem_inplanes, kernel_size=3, stride=2, padding=1,
                use_bias=False, norm=self.norm, activation=nn.relu,
                dtype=self.dtype, name=f"stem_conv{i}",
            )(x)
        # stage 1: 4 bottlenecks at 1/4, out 4*stem_inplanes
        for b in range(4):
            x = BottleneckBlock(
                in_channels=x.shape[-1],
                out_channels=self.stem_inplanes * 4,
                bottleneck_channels=self.stem_inplanes,
                norm=self.norm,
                dtype=self.dtype,
                name=f"stage1_block{b}",
            )(x)

        xs = [x]
        for s, (nm, nbl, chs) in enumerate(
            zip(self.stage_num_modules, self.stage_num_blocks, self.stage_channels)
        ):
            # transition: match channels per branch; new branch = stride-2 conv
            new_xs = []
            for i, c in enumerate(chs):
                if i < len(xs):
                    src = xs[i]
                    if src.shape[-1] != c:
                        src = Conv2d(
                            c, kernel_size=3, padding=1, use_bias=False,
                            norm=self.norm, activation=nn.relu, dtype=self.dtype,
                            name=f"t{s}_match{i}",
                        )(src)
                    new_xs.append(src)
                else:
                    new_xs.append(
                        Conv2d(
                            c, kernel_size=3, stride=2, padding=1, use_bias=False,
                            norm=self.norm, activation=nn.relu, dtype=self.dtype,
                            name=f"t{s}_new{i}",
                        )(new_xs[-1] if i > len(xs) else xs[-1])
                    )
            xs = _Stage(
                nm, nbl, chs, self.norm, self.dtype, name=f"stage{s + 2}"
            )(new_xs)
        return {f"hr{i + 1}": f for i, f in enumerate(xs)}

    def output_shape(self) -> Dict[str, ShapeSpec]:
        chs = self.stage_channels[-1]
        return {
            f"hr{i + 1}": ShapeSpec(channels=c, stride=4 * 2**i)
            for i, c in enumerate(chs)
        }

    @property
    def size_divisibility(self) -> int:
        return 32


class HRFPN(Backbone):
    """HRNet -> 5-level 256-ch pyramid (p1..p5, strides 4..64 — the
    reference hrfpn.py:123 names levels p1..p5 with stride 2**(i+2))."""

    bottom_up: HRNet
    out_channels: int = 256
    n_out_features: int = 5
    norm: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        feats = self.bottom_up(x)
        keys = sorted(feats.keys())
        base = feats[keys[0]]
        n, h, w, _ = base.shape
        ups = [base]
        for k in keys[1:]:
            f = feats[k]
            ups.append(
                jax.image.resize(f, (n, h, w, f.shape[-1]), "bilinear").astype(f.dtype)
            )
        cat = jnp.concatenate(ups, axis=-1)
        out = {}
        for i in range(self.n_out_features):
            s = 2**i
            y = Conv2d(
                self.out_channels, kernel_size=s, stride=s, padding=0,
                use_bias=False, norm=self.norm, activation=nn.relu,
                dtype=self.dtype, name=f"reduce{i}",
            )(cat)
            out[f"p{i + 1}"] = Conv2d(
                self.out_channels, kernel_size=3, padding=1, dtype=self.dtype,
                name=f"fpn_conv{i}",
            )(y)
        return out

    def output_shape(self) -> Dict[str, ShapeSpec]:
        return {
            f"p{i + 1}": ShapeSpec(channels=self.out_channels, stride=4 * 2**i)
            for i in range(self.n_out_features)
        }

    @property
    def size_divisibility(self) -> int:
        return 32


def _hrnet_from_config(cfg: CfgNode) -> HRNet:
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    h = cfg.MODEL.HRNET
    return HRNet(
        stem_inplanes=h.STEM_INPLANES,
        stage_num_modules=(
            h.STAGE2.NUM_MODULES, h.STAGE3.NUM_MODULES, h.STAGE4.NUM_MODULES
        ),
        stage_num_blocks=(
            tuple(h.STAGE2.NUM_BLOCKS), tuple(h.STAGE3.NUM_BLOCKS),
            tuple(h.STAGE4.NUM_BLOCKS),
        ),
        stage_channels=(
            tuple(h.STAGE2.NUM_CHANNELS), tuple(h.STAGE3.NUM_CHANNELS),
            tuple(h.STAGE4.NUM_CHANNELS),
        ),
        norm=cfg.MODEL.HRNET.NORM,
        dtype=dtype,
    )


@BACKBONE_REGISTRY.register()
def build_pose_hrnet_backbone(cfg: CfgNode, input_shape: ShapeSpec) -> HRNet:
    return _hrnet_from_config(cfg)


@BACKBONE_REGISTRY.register()
def build_hrfpn_backbone(cfg: CfgNode, input_shape: ShapeSpec) -> HRFPN:
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return HRFPN(
        bottom_up=_hrnet_from_config(cfg),
        out_channels=cfg.MODEL.HRNET.HRFPN.OUT_CHANNELS,
        norm=cfg.MODEL.HRNET.NORM,
        dtype=dtype,
    )
