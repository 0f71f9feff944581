import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jtsm_tpu.modeling.roi_heads.cascade_rcnn  # noqa: F401 (registers)
from jtsm_tpu.config import get_cfg
from jtsm_tpu.layers import deform_conv2d
from jtsm_tpu.modeling import build_backbone, build_model


def _cascade_cfg():
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16], [32], [64], [128], [256]]
    cfg.MODEL.ROI_HEADS.NAME = "CascadeROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def _batch(rng, b=2, g=3):
    return {
        "image": jnp.asarray(rng.rand(b, 64, 64, 3).astype(np.float32) * 255),
        "image_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "orig_sizes": jnp.tile(jnp.asarray([[64, 64]], jnp.int32), (b, 1)),
        "gt_boxes": jnp.asarray(
            np.concatenate([rng.rand(b, g, 2) * 20, 25 + rng.rand(b, g, 2) * 20], -1).astype(
                np.float32
            )
        ),
        "gt_classes": jnp.asarray(rng.randint(0, 3, (b, g)), jnp.int32),
        "gt_valid": jnp.ones((b, g), bool),
    }


@pytest.fixture(scope="module")
def cascade_model_and_vars():
    cfg = _cascade_cfg()
    model = build_model(cfg)
    batch = _batch(np.random.RandomState(0))
    vs = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)}, batch, train=True
    )
    return model, vs, batch


def test_cascade_train_eval(cascade_model_and_vars):
    model, vs, batch = cascade_model_and_vars
    losses = model.apply(vs, batch, train=True, rngs={"sampling": jax.random.key(2)})
    assert "loss_cls_stage0" in losses and "loss_cls_stage2" in losses
    assert all(np.isfinite(float(v)) for v in losses.values())
    out = model.apply(vs, batch, train=False)
    assert out["boxes"].shape == (2, 100, 4)


def test_dcn_zero_offsets_match_conv():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    off = jnp.zeros((1, 8, 8, 18))
    kern = jnp.asarray(rng.rand(3, 3, 4, 6).astype(np.float32))
    y = deform_conv2d(x, off, kern)
    tx = torch.from_numpy(np.asarray(x).copy().transpose(0, 3, 1, 2))
    tw = torch.from_numpy(np.asarray(kern).copy().transpose(3, 2, 0, 1))
    ty = torch.nn.functional.conv2d(tx, tw, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), ty, atol=1e-4)


def test_deform_resnet_stage():
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE = [False, False, True, False]
    cfg.MODEL.RESNETS.DEFORM_MODULATED = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    bb = build_backbone(cfg)
    v = bb.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    o = bb.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert o["res4"].shape == (1, 4, 4, 1024)


def test_tta_union(cascade_model_and_vars):
    from jtsm_tpu.modeling.test_time_augmentation import GeneralizedRCNNWithTTA

    model, vs, _ = cascade_model_and_vars
    jitted = jax.jit(lambda v, bt: model.apply(v, bt, train=False))

    def predict(bt):
        return jitted(vs, {k: jnp.asarray(v) for k, v in bt.items()})

    tta = GeneralizedRCNNWithTTA(
        predict,
        min_sizes=(48, 64),
        max_size=96,
        buckets=[(64, 64), (96, 96), (96, 64), (64, 96), (48, 64), (64, 48)],
    )
    rng = np.random.RandomState(1)
    out = tta((rng.rand(60, 80, 3) * 255).astype(np.float32))
    assert out["boxes"].ndim == 2 and out["boxes"].shape[1] == 4
    assert len(out["scores"]) == len(out["boxes"])


def _deform_conv_bruteforce(x, offsets, kernel, mask=None, stride=1, dilation=1):
    """Numpy transcription of the reference deformable im2col bilinear
    sampling (detectron2 layers/csrc/deformable/deform_conv_cuda_kernel.cu
    ``deformable_im2col_bilinear``: 4-tap bilinear, out-of-bounds taps
    contribute zero), centered kernel taps, optional DCNv2 modulation."""
    b, h, w, cin = x.shape
    k = kernel.shape[0]
    oh = (h - 1) // stride + 1
    ow = (w - 1) // stride + 1
    cout = kernel.shape[-1]
    out = np.zeros((b, oh, ow, cout), np.float64)
    off = offsets.reshape(b, oh, ow, k * k, 2)
    msk = None if mask is None else mask.reshape(b, oh, ow, k, k)

    def bil(img, yy, xx):
        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
        fy, fx = yy - y0, xx - x0
        v = np.zeros(cin, np.float64)
        for dy2, wy in ((0, 1 - fy), (1, fy)):
            for dx2, wx in ((0, 1 - fx), (1, fx)):
                yi, xi = y0 + dy2, x0 + dx2
                if 0 <= yi < h and 0 <= xi < w:
                    v += wy * wx * img[yi, xi]
        return v

    for bi in range(b):
        for oy in range(oh):
            for ox in range(ow):
                acc = np.zeros(cout, np.float64)
                for ky in range(k):
                    for kx in range(k):
                        t = ky * k + kx
                        sy = oy * stride + (ky - (k - 1) / 2.0) * dilation + off[bi, oy, ox, t, 0]
                        sx = ox * stride + (kx - (k - 1) / 2.0) * dilation + off[bi, oy, ox, t, 1]
                        v = bil(x[bi], sy, sx)
                        if msk is not None:
                            v = v * msk[bi, oy, ox, ky, kx]
                        acc += v @ kernel[ky, kx]
                out[bi, oy, ox] = acc
    return out


@pytest.mark.parametrize("modulated", [False, True])
def test_dcn_bilinear_parity_with_real_offsets(modulated):
    """Nonzero fractional offsets (incl. out-of-bounds samples) against the
    brute-force transcription of the reference deformable bilinear
    sampling."""
    rng = np.random.RandomState(3)
    b, h, w, cin, cout, k = 1, 6, 7, 3, 4, 3
    x = rng.randn(b, h, w, cin).astype(np.float32)
    offsets = (rng.rand(b, h, w, 2 * k * k).astype(np.float32) - 0.5) * 5.0
    kern = rng.randn(k, k, cin, cout).astype(np.float32) * 0.2
    mask = rng.rand(b, h, w, k * k).astype(np.float32) if modulated else None

    ref = _deform_conv_bruteforce(
        x.astype(np.float64), offsets.astype(np.float64),
        kern.astype(np.float64), None if mask is None else mask.astype(np.float64),
    )
    got = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(kern),
        None if mask is None else jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)
