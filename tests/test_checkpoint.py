import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jtsm_tpu.checkpoint import (
    DetectionCheckpointer,
    convert_c2_detectron_names,
    convert_d2_state_dict_to_variables,
)
from jtsm_tpu.config import get_cfg
from jtsm_tpu.modeling import build_model


def _tiny_model_and_vars():
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.MASK_ON = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    b, h, w = 1, 64, 64
    batch = {
        "image": jnp.zeros((b, h, w, 3)),
        "image_sizes": jnp.asarray([[h, w]], jnp.int32),
        "orig_sizes": jnp.asarray([[h, w]], jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(0)}, batch, train=False
    )
    return model, dict(variables), batch


def test_d2_name_conversion_backbone():
    model, variables, _ = _tiny_model_and_vars()
    # build a synthetic d2 state dict for a few representative weights
    sd = {
        "backbone.bottom_up.stem.conv1.weight": np.random.randn(64, 3, 7, 7).astype(np.float32),
        "backbone.bottom_up.stem.conv1.norm.weight": np.ones(64, np.float32) * 2,
        "backbone.bottom_up.stem.conv1.norm.running_var": np.ones(64, np.float32) * 3,
        "backbone.bottom_up.res2.0.conv1.weight": np.random.randn(64, 64, 3, 3).astype(np.float32),
        "backbone.bottom_up.res2.0.conv1.norm.bias": np.ones(64, np.float32),
        "backbone.fpn_lateral2.weight": np.random.randn(256, 64, 1, 1).astype(np.float32),
        "backbone.fpn_lateral2.bias": np.zeros(256, np.float32),
        "proposal_generator.rpn_head.conv.weight": np.random.randn(256, 256, 3, 3).astype(np.float32),
        "roi_heads.box_head.fc1.weight": np.random.randn(1024, 12544).astype(np.float32),
        "roi_heads.box_predictor.cls_score.bias": np.random.randn(81).astype(np.float32),
        "roi_heads.mask_head.deconv.weight": np.random.randn(256, 256, 2, 2).astype(np.float32),
        "roi_heads.mask_head.predictor.weight": np.random.randn(80, 256, 1, 1).astype(np.float32),
    }
    out, matched, unmatched = convert_d2_state_dict_to_variables(sd, variables)
    assert unmatched == [], unmatched
    assert len(matched) == len(sd)
    # conv layout OIHW -> HWIO
    got = out["params"]["backbone"]["bottom_up"]["stem"]["conv1"]["conv"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(got), sd["backbone.bottom_up.stem.conv1.weight"].transpose(2, 3, 1, 0)
    )
    # norm goes to frozen collection
    np.testing.assert_allclose(
        np.asarray(out["frozen"]["backbone"]["bottom_up"]["stem"]["conv1"]["norm"]["weight"]),
        2 * np.ones(64),
    )
    # linear transposed
    got_fc = out["params"]["roi_heads"]["box_head"]["fc1"]["dense"]["kernel"]
    assert got_fc.shape == (12544, 1024)


def test_c2_name_conversion():
    sd = {
        "conv1_w": np.zeros((64, 3, 7, 7), np.float32),
        "conv1_b": np.zeros((64,), np.float32),
        "res_conv1_bn_s": np.ones(64, np.float32),
        "res_conv1_bn_b": np.zeros(64, np.float32),
        "res2_0_branch2a_w": np.zeros((64, 64, 1, 1), np.float32),
        "res2_0_branch2a_bn_s": np.ones(64, np.float32),
        "res2_0_branch1_w": np.zeros((256, 64, 1, 1), np.float32),
        "res4_2_branch2b_w": np.zeros((256, 256, 3, 3), np.float32),
        "fc1000_w": np.zeros((1000, 2048), np.float32),
    }
    out = convert_c2_detectron_names(sd)
    assert "stem.conv1.weight" in out
    assert "res2.0.conv1.weight" in out
    assert "res2.0.conv1.norm.weight" in out
    assert "res2.0.shortcut.weight" in out
    assert "res4.2.conv2.weight" in out
    assert not any(k.startswith("fc1000") for k in out)


def test_checkpointer_save_load_roundtrip(tmp_path):
    model, variables, batch = _tiny_model_and_vars()
    ckpt = DetectionCheckpointer(variables, save_dir=str(tmp_path))
    ckpt.save("model_test", iteration=7)
    assert ckpt.has_checkpoint()

    # mutate then reload
    ckpt2 = DetectionCheckpointer(
        jax.tree_util.tree_map(lambda x: x * 0, variables), save_dir=str(tmp_path)
    )
    extra = ckpt2.resume_or_load("", resume=True)
    assert extra.get("iteration") == 7
    leaf_a = jax.tree_util.tree_leaves(variables)[0]
    leaf_b = jax.tree_util.tree_leaves(ckpt2.variables)[0]
    np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b))


def test_torch_conv_parity():
    """Converted OIHW weights give identical outputs to torch Conv2d."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    rng = np.random.RandomState(0)
    w = rng.randn(8, 3, 3, 3).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    x = rng.randn(1, 5, 6, 3).astype(np.float32)

    tconv = torch.nn.Conv2d(3, 8, 3, stride=1, padding=1)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
        t_out = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    conv = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)))
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}}
    j_out = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, atol=1e-4)


def test_torch_deconv_parity():
    """Converted deconv weights match torch ConvTranspose2d (2x2, stride 2)."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    rng = np.random.RandomState(1)
    w = rng.randn(4, 6, 2, 2).astype(np.float32)  # (in, out, kh, kw)
    x = rng.randn(1, 3, 5, 4).astype(np.float32)

    tdeconv = torch.nn.ConvTranspose2d(4, 6, 2, stride=2, bias=False)
    with torch.no_grad():
        tdeconv.weight.copy_(torch.from_numpy(w))
        t_out = tdeconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    deconv = nn.ConvTranspose(6, (2, 2), strides=(2, 2), use_bias=False)
    kernel = jnp.asarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])
    j_out = np.asarray(deconv.apply({"params": {"kernel": kernel}}, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, atol=1e-4)
