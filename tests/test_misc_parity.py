"""Misc parity tests mirroring the reference's smaller suites: keypoints
codec, samplers, events, model zoo, config compat, Instances conversion,
transforms."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_keypoints_heatmap_roundtrip():
    from jtsm_tpu.structures import heatmaps_to_keypoints, keypoints_to_heatmap

    rois = jnp.asarray([[0.0, 0.0, 56.0, 56.0]])
    kpts = jnp.asarray([[[10.0, 20.0, 2.0], [40.0, 12.0, 2.0], [-5.0, 3.0, 0.0]]])
    heat, valid = keypoints_to_heatmap(kpts, rois, 56)
    assert np.asarray(valid).tolist() == [[1, 1, 0]]
    # decode a synthetic heatmap with peaks at the encoded bins
    maps = np.full((1, 3, 56, 56), -10.0, np.float32)
    h = np.asarray(heat)[0]
    for k in range(2):
        maps[0, k, h[k] // 56, h[k] % 56] = 10.0
    out = heatmaps_to_keypoints(jnp.asarray(maps), rois)
    out = np.asarray(out)
    np.testing.assert_allclose(out[0, 0, :2], [10.5, 20.5], atol=1.0)
    np.testing.assert_allclose(out[0, 1, :2], [40.5, 12.5], atol=1.0)


def test_training_sampler_sharding():
    import itertools

    from jtsm_tpu.data.samplers import InferenceSampler, TrainingSampler

    s = TrainingSampler(10, shuffle=True, seed=7)
    idxs = list(itertools.islice(iter(s), 30))
    assert set(idxs) == set(range(10))
    # deterministic given seed
    s2 = TrainingSampler(10, shuffle=True, seed=7)
    assert list(itertools.islice(iter(s2), 30)) == idxs

    inf = InferenceSampler(10)
    assert list(inf) == list(range(10))
    assert len(inf) == 10


def test_repeat_factor_sampler():
    from jtsm_tpu.data.samplers import RepeatFactorTrainingSampler

    dicts = [
        {"annotations": [{"category_id": 0}]},  # frequent
        {"annotations": [{"category_id": 0}]},
        {"annotations": [{"category_id": 1}]},  # rare
    ]
    rf = RepeatFactorTrainingSampler.repeat_factors_from_category_frequency(dicts, 0.9)
    assert rf[2] > rf[0] >= 1.0


def test_event_storage():
    from jtsm_tpu.utils.events import EventStorage, get_event_storage

    with EventStorage(0) as s:
        s.put_scalar("loss", 3.0)
        s.step()
        s.put_scalar("loss", 1.0)
        assert get_event_storage() is s
        assert s.history("loss").latest() == 1.0
        assert s.history("loss").median(10) == 2.0
        with s.name_scope("rpn"):
            s.put_scalar("x", 5.0)
        assert "rpn/x" in s.latest()


def test_model_zoo_config():
    from jtsm_tpu import model_zoo

    cfg = model_zoo.get_config("COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml")
    assert cfg.MODEL.MASK_ON
    assert cfg.MODEL.RESNETS.DEPTH == 50
    url = model_zoo.get_checkpoint_url("COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml")
    assert url.startswith("https://")


def test_config_compat_upgrade():
    from jtsm_tpu.config import CfgNode
    from jtsm_tpu.config.compat import downgrade_config, guess_version, upgrade_config

    old = CfgNode({"VERSION": 1, "MODEL": {"WEIGHT": "/x.pkl", "RPN_HEAD": {"NAME": "H"}}})
    # V1 -> V2 renames via ConverterV2
    up = upgrade_config(old, 2)
    assert up.MODEL.WEIGHTS == "/x.pkl"
    assert up.VERSION == 2

    anon = CfgNode({"MODEL": {"WEIGHT": "/x.pkl"}})
    assert guess_version(anon, "f.yaml") == 1


def test_instances_conversion():
    from jtsm_tpu.modeling.instances_io import (
        batched_outputs_to_instances,
        split_batched_outputs,
    )

    outputs = {
        "boxes": np.array([[[0, 0, 10, 10], [5, 5, 6, 6]]], np.float32),
        "scores": np.array([[0.9, 0.0]], np.float32),
        "classes": np.array([[3, 0]], np.int32),
        "valid": np.array([[True, False]]),
        "masks": np.ones((1, 2, 28, 28), np.float32),
    }
    inst = batched_outputs_to_instances(outputs, 0, (20, 20), paste_masks=True)
    assert len(inst) == 1
    assert inst.pred_classes[0] == 3
    assert inst.pred_masks.shape == (1, 20, 20)
    lst = split_batched_outputs(outputs, [(20, 20)])
    assert "instances" in lst[0]


def test_transforms_inverse():
    from jtsm_tpu.data.transforms import HFlipTransform, ResizeTransform, TransformList

    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    t = TransformList([ResizeTransform(4, 6, 8, 12), HFlipTransform(12)])
    coords = np.array([[1.0, 1.0], [5.0, 3.0]])
    out = t.apply_coords(coords.copy())
    back = t.inverse().apply_coords(out.copy())
    np.testing.assert_allclose(back, coords, atol=1e-6)

    boxes = np.array([[0.0, 0.0, 3.0, 2.0]])
    out_b = t.transforms[1].apply_box(t.transforms[0].apply_box(boxes))
    assert out_b[0, 0] < out_b[0, 2]  # x0 < x1 preserved after flip


def test_random_augmentations_shapes():
    from jtsm_tpu.data.transforms import (
        AugInput,
        AugmentationList,
        RandomBrightness,
        RandomCrop,
        RandomFlip,
        ResizeShortestEdge,
    )

    np.random.seed(0)
    img = (np.random.rand(40, 60, 3) * 255).astype(np.uint8)
    augs = AugmentationList(
        [
            ResizeShortestEdge([30, 30], 50),
            RandomFlip(prob=1.0),
            RandomBrightness(0.9, 1.1),
            RandomCrop("relative", (0.5, 0.5)),
        ]
    )
    inp = AugInput(img, boxes=np.array([[5.0, 5.0, 20.0, 20.0]]))
    tfm = augs(inp)
    assert inp.image.ndim == 3
    assert inp.boxes.shape == (1, 4)


def test_random_apply():
    """RandomApply (reference augmentation_impl.py:36): prob 1 applies the
    wrapped transform, prob 0 is a NoOp."""
    import numpy as np

    from jtsm_tpu.data.transforms import (
        AugInput,
        HFlipTransform,
        NoOpTransform,
        RandomApply,
        RandomFlip,
    )

    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    # wraps a raw Transform
    t = RandomApply(HFlipTransform(2), prob=1.0)(AugInput(img.copy()))
    assert isinstance(t, HFlipTransform)
    t = RandomApply(HFlipTransform(2), prob=0.0)(AugInput(img.copy()))
    assert isinstance(t, NoOpTransform)
    # wraps an Augmentation
    t = RandomApply(RandomFlip(prob=1.0), prob=1.0)(AugInput(img.copy()))
    assert isinstance(t, HFlipTransform)
