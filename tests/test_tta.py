"""Test-time augmentation wrappers (reference
detectron2/modeling/test_time_augmentation.py and
projects/WSL/wsl/modeling/test_time_augmentation_avg.py)."""

import numpy as np

from jtsm_tpu.modeling.test_time_augmentation import (
    GeneralizedRCNNWithTTA,
    GeneralizedRCNNWithTTAAVG,
)


def _make_image(h=96, w=128):
    img = np.zeros((h, w, 3), np.float32)
    img[40:50, 60:70] = 255.0  # bright patch: box (60, 40, 70, 50)
    return img


def test_tta_union_maps_boxes_back_to_original_coords():
    """A fake detector that localizes the bright patch in each augmented view
    must produce (after inverse flip + NMS merge) a single box at the patch's
    original location."""

    def predict(batch):
        im = batch["image"][0]
        hh, ww = int(batch["image_sizes"][0][0]), int(batch["image_sizes"][0][1])
        oh, ow = int(batch["orig_sizes"][0][0]), int(batch["orig_sizes"][0][1])
        mask = im[..., 0] > 128
        ys, xs = np.nonzero(mask)
        # box in view coords -> original scale (like detector_postprocess)
        sx, sy = ow / ww, oh / hh
        box = np.asarray(
            [[xs.min() * sx, ys.min() * sy, (xs.max() + 1) * sx, (ys.max() + 1) * sy]],
            np.float32,
        )
        return {
            "boxes": box[None],
            "scores": np.asarray([[0.9]], np.float32),
            "classes": np.asarray([[2]], np.int64),
            "valid": np.asarray([[True]]),
        }

    tta = GeneralizedRCNNWithTTA(
        predict,
        min_sizes=(64, 96),
        max_size=200,
        flip=True,
        buckets=((256, 256),),
    )
    out = tta(_make_image(), topk=10, nms_thresh=0.5)
    assert len(out["boxes"]) >= 1
    # all surviving boxes agree with the patch location in ORIGINAL coords
    for b in out["boxes"]:
        assert np.allclose(b, [60, 40, 70, 50], atol=2.5), b
    assert out["classes"][0] == 2


def test_tta_union_equals_bruteforce_union_then_nms():
    """Pin GeneralizedRCNNWithTTAUNION (= the base TTA) against a brute-force
    reference: concatenate every view's inverse-transformed detections, then
    greedy per-class NMS by descending score (reference
    test_time_augmentation_union.py:246-261 _merge_detections)."""
    from jtsm_tpu.modeling.test_time_augmentation import GeneralizedRCNNWithTTAUNION

    h0, w0 = 40, 60
    img = np.zeros((h0, w0, 3), np.float32)
    img[0, 0, 0] = 255.0  # flip marker: view is unflipped iff pixel (0,0) hot

    # per-view detections in VIEW coordinates (min_size 40 on a 40x60 image
    # is the identity resize, so view coords == original coords modulo flip)
    unflipped = (
        np.asarray([[0, 0, 10, 10], [20, 5, 30, 15]], np.float32),
        np.asarray([0.9, 0.8], np.float32),
        np.asarray([0, 1], np.int64),
    )
    flipped_view = (
        # original-coords [2,0,12,10] and [40,20,50,30], expressed flipped
        np.asarray([[w0 - 12, 0, w0 - 2, 10], [w0 - 50, 20, w0 - 40, 30]], np.float32),
        np.asarray([0.85, 0.7], np.float32),
        np.asarray([0, 0], np.int64),
    )

    def predict(batch):
        is_unflipped = batch["image"][0, 0, 0, 0] > 128
        b, s, c = unflipped if is_unflipped else flipped_view
        return {
            "boxes": b[None],
            "scores": s[None],
            "classes": c[None],
            "valid": np.ones((1, len(b)), bool),
        }

    tta = GeneralizedRCNNWithTTAUNION(
        predict, min_sizes=(40,), max_size=100, flip=True, buckets=((64, 64),)
    )
    out = tta(img, topk=10, nms_thresh=0.5)

    # brute-force reference: union in original coords + greedy per-class NMS
    def unflip(b):
        return np.stack([w0 - b[:, 2], b[:, 1], w0 - b[:, 0], b[:, 3]], axis=1)

    ub = np.concatenate([unflipped[0], unflip(flipped_view[0])])
    us = np.concatenate([unflipped[1], flipped_view[1]])
    uc = np.concatenate([unflipped[2], flipped_view[2]])

    def iou(a, b):
        x0 = max(a[0], b[0]); y0 = max(a[1], b[1])
        x1 = min(a[2], b[2]); y1 = min(a[3], b[3])
        inter = max(0.0, x1 - x0) * max(0.0, y1 - y0)
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / ua

    keep = []
    for i in np.argsort(-us):
        if all(uc[i] != uc[j] or iou(ub[i], ub[j]) <= 0.5 for j in keep):
            keep.append(int(i))
    exp_boxes, exp_scores, exp_classes = ub[keep], us[keep], uc[keep]

    order = np.argsort(-out["scores"])
    np.testing.assert_allclose(out["boxes"][order], exp_boxes, atol=1e-4)
    np.testing.assert_allclose(out["scores"][order], exp_scores, atol=1e-6)
    np.testing.assert_array_equal(out["classes"][order], exp_classes)
    # the flipped view's near-duplicate of box A (IoU 0.67, same class) must
    # have been suppressed by the union NMS
    assert len(out["boxes"]) == 3


def test_tta_avg_scores_and_detections():
    """A fake WSOD head that scores each (view-space) proposal by its
    normalized area is augmentation-invariant, so the TTA average must equal
    the single-view scores; final detections pick the top-scoring proposal."""
    rng = np.random.RandomState(0)
    r, c = 8, 3
    proposals = np.concatenate(
        [rng.rand(r, 2) * 40, 50 + rng.rand(r, 2) * 40], axis=1
    ).astype(np.float32)
    prop_scores = np.zeros((r,), np.float32)
    prop_scores[-2:] = -np.inf  # padding rows
    proposals[-2:] = 0

    def predict(batch):
        p = batch["proposals"][0]
        hh, ww = [float(v) for v in batch["image_sizes"][0]]
        area = ((p[:, 2] - p[:, 0]) * (p[:, 3] - p[:, 1])) / (hh * ww)
        scores = np.stack([area * (k + 1) / c for k in range(c)], axis=1)
        return {"proposal_class_scores": scores.astype(np.float32)[None]}

    tta = GeneralizedRCNNWithTTAAVG(
        predict,
        min_sizes=(64, 96),
        max_size=200,
        flip=True,
        buckets=((256, 256),),
    )
    img = _make_image()
    out = tta(img, proposals, prop_scores, predict, score_thresh=1e-6, nms_thresh=0.3, topk=5)
    avg = out["proposal_class_scores"]
    assert avg.shape == (r, c)
    # invariant scorer => average == single-view scores (orig-coords view)
    h0, w0 = img.shape[:2]
    area0 = (
        (proposals[:, 2] - proposals[:, 0]) * (proposals[:, 3] - proposals[:, 1])
    ) / (h0 * w0)
    expect = np.stack([area0 * (k + 1) / c for k in range(c)], axis=1)
    assert np.allclose(avg, expect, rtol=0.05, atol=1e-4)

    det = out["detections"]
    assert len(det["boxes"]) >= 1
    # the best detection is the largest valid proposal, class c-1
    best = np.argmax(area0[:-2])
    assert int(det["classes"][0]) == c - 1
    assert np.allclose(det["boxes"][0], proposals[best], atol=1e-3)


def test_tta_mask_rerun_on_merged_boxes():
    """The TTA mask path re-runs the mask head on merged boxes in every
    augmented view and AVERAGES probabilities (reference
    test_time_augmentation_union.py:207-291), un-flipping flipped views."""
    calls = []

    def predict(batch):
        if "detected_boxes" in batch:
            hh, ww = int(batch["image_sizes"][0][0]), int(batch["image_sizes"][0][1])
            flipped = len(calls) % 2 == 1  # views alternate (img, flipped)
            calls.append((hh, ww))
            d = batch["detected_boxes"].shape[1]
            # constant-prob masks distinguish views; a left-right gradient
            # checks un-flipping
            grad = np.tile(np.linspace(0, 1, 8, dtype=np.float32), (8, 1))
            m = grad[::-1, ::-1] if flipped else grad
            return {"masks": np.tile(m[None, None], (1, d, 1, 1)), "boxes": batch["detected_boxes"]}
        im = batch["image"][0]
        hh, ww = int(batch["image_sizes"][0][0]), int(batch["image_sizes"][0][1])
        oh, ow = int(batch["orig_sizes"][0][0]), int(batch["orig_sizes"][0][1])
        mask = im[..., 0] > 128
        ys, xs = np.nonzero(mask)
        sx, sy = ow / ww, oh / hh
        box = np.asarray(
            [[xs.min() * sx, ys.min() * sy, (xs.max() + 1) * sx, (ys.max() + 1) * sy]],
            np.float32,
        )
        return {
            "boxes": box[None],
            "scores": np.asarray([[0.9]], np.float32),
            "classes": np.asarray([[2]], np.int64),
            "valid": np.asarray([[True]]),
            "masks": np.zeros((1, 1, 8, 8), np.float32),  # source-aug masks
        }

    tta = GeneralizedRCNNWithTTA(
        predict, min_sizes=(64,), max_size=200, flip=True, buckets=((256, 256),)
    )
    out = tta(_make_image(), topk=4, nms_thresh=0.5)
    assert len(calls) == 2  # given-boxes re-run in both views
    grad = np.tile(np.linspace(0, 1, 8, dtype=np.float32), (8, 1))
    # unflipped view contributes grad; flipped view contributes
    # (grad flipped ud+lr) then un-flipped lr by the wrapper
    expect = (grad + grad[::-1, ::-1][:, ::-1]) / 2
    np.testing.assert_allclose(out["masks"][0], expect, atol=1e-6)


def test_tta_given_boxes_e2e_tiny_model():
    """End-to-end: a real tiny Mask R-CNN supports the given-boxes inference
    branch (detected_boxes -> forward_with_given_boxes -> masks), so the TTA
    mask re-run path runs on an actual model."""
    import jax
    import jax.numpy as jnp

    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.modeling import build_model
    from tests.modeling.test_meta_archs import _fpn_tiny

    cfg = get_cfg()
    _fpn_tiny(cfg)
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    model = build_model(cfg)

    h = w = 64
    rng = np.random.RandomState(0)
    base = {
        "image": np.asarray(rng.rand(1, h, w, 3), np.float32) * 255,
        "image_sizes": np.asarray([[h, w]], np.int32),
        "orig_sizes": np.asarray([[h, w]], np.int32),
    }
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        {k: jnp.asarray(v) for k, v in base.items()},
        train=False,
    )
    given_calls = []

    def predict(batch):
        if "detected_boxes" in batch:
            given_calls.append(1)
        return model.apply(variables, {k: jnp.asarray(v) for k, v in batch.items()}, train=False)

    tta = GeneralizedRCNNWithTTA(
        predict, min_sizes=(48,), max_size=96, flip=True, buckets=((64, 64),)
    )
    out = tta(base["image"][0], topk=8, nms_thresh=0.5)
    if len(out["boxes"]):
        assert len(given_calls) == 2  # rerun in both views
        assert out["masks"].shape[0] == len(out["boxes"])
        assert np.all((out["masks"] >= 0) & (out["masks"] <= 1))


def test_tta_avg_threads_superpixels_per_view():
    """With superpixels given, every augmented view's batch must carry a
    superpixel map matching the view geometry (nearest resize + flip, padded
    to the bucket) plus the geometry-free oh_labels — the reference WSL
    DatasetMapperTTAAVG contract."""
    rng = np.random.RandomState(1)
    r, s = 6, 16
    h0 = w0 = 128
    proposals = np.concatenate(
        [rng.rand(r, 2) * 40, 50 + rng.rand(r, 2) * 40], axis=1
    ).astype(np.float32)
    prop_scores = np.zeros((r,), np.float32)
    # left half superpixel 3, right half superpixel 7
    sp = np.full((h0, w0), 3, np.int32)
    sp[:, w0 // 2 :] = 7
    oh = rng.rand(r, s) > 0.5

    seen = []

    def predict(batch):
        assert "superpixels" in batch and "oh_labels" in batch
        hh, ww = [int(v) for v in batch["image_sizes"][0]]
        spv = batch["superpixels"][0]
        assert spv.shape == batch["image"].shape[1:3]
        np.testing.assert_array_equal(batch["oh_labels"][0], oh)
        # view-left value: 3 unflipped, 7 flipped
        seen.append(int(spv[hh // 2, 0]))
        assert int(spv[hh // 2, max(ww - 1, 0)]) == (3 if seen[-1] == 7 else 7)
        scores = np.ones((r, 2), np.float32)
        return {"proposal_class_scores": scores[None]}

    tta = GeneralizedRCNNWithTTAAVG(
        predict, min_sizes=(64,), max_size=200, flip=True, buckets=((96, 96),)
    )
    img = np.zeros((h0, w0, 3), np.float32)
    tta(
        img,
        proposals,
        prop_scores,
        predict,
        topk=4,
        superpixels=sp,
        oh_labels=oh,
    )
    assert sorted(seen) == [3, 7]  # one unflipped + one flipped view


def test_tta_avg_mask_rerun():
    """TTA-AVG re-runs the mask branch on merged boxes per view and averages
    flip-corrected probabilities (reference test_time_augmentation_avg.py
    :405-428)."""
    rng = np.random.RandomState(0)
    r, c, s = 4, 2, 6
    proposals = np.asarray(
        [[10.0, 10, 60, 60], [20.0, 20, 80, 80], [0.0, 0, 30, 30], [5.0, 5, 90, 90]],
        np.float32,
    )
    prop_scores = np.zeros((r,), np.float32)

    # an asymmetric base mask: flipped views return it pre-flipped, so the
    # average must reconstruct the base exactly
    base = np.zeros((s, s), np.float32)
    base[:, : s // 2] = 1.0
    calls = {"given": 0}

    def predict(batch):
        d_boxes = batch.get("detected_boxes")
        hh, ww = [float(v) for v in batch["image_sizes"][0]]
        if d_boxes is None:
            p = batch["proposals"][0]
            area = ((p[:, 2] - p[:, 0]) * (p[:, 3] - p[:, 1])) / (hh * ww)
            scores = np.stack([area * (k + 1) / c for k in range(c)], axis=1)
            return {
                "proposal_class_scores": scores.astype(np.float32)[None],
                "masks": np.zeros((1, 1, s, s), np.float32),  # advertise masks
            }
        calls["given"] += 1
        d = d_boxes.shape[1]
        # detect a flipped view: the merged boxes arrive flipped, so x-center
        # of the FIRST (largest) box moves to the right half
        flipped = d_boxes[0, 0, 0] + d_boxes[0, 0, 2] > ww
        m = base[:, ::-1] if flipped else base
        return {"masks": np.tile(m, (1, d, 1, 1)).astype(np.float32)}

    tta = GeneralizedRCNNWithTTAAVG(
        predict, min_sizes=(64,), max_size=200, flip=True, buckets=((256, 256),)
    )
    img = _make_image()
    out = tta(img, proposals, prop_scores, predict, score_thresh=1e-6, nms_thresh=0.3, topk=4)
    det = out["detections"]
    assert calls["given"] == 2  # one plain + one flipped view
    assert "masks" in det and det["masks"].shape[1:] == (s, s)
    # flip-corrected average == the base mask for every detection
    for m in det["masks"]:
        np.testing.assert_allclose(m, base, atol=1e-6)
