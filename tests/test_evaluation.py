import numpy as np
import pytest

from jtsm_tpu.evaluation import COCOEval, pq_compute_single_image, voc_ap
from jtsm_tpu.evaluation.cocoeval import box_iou_xywh
from jtsm_tpu.evaluation.panoptic_evaluation import PQStat


def _gt_dataset():
    images = [{"id": 1, "height": 100, "width": 100}, {"id": 2, "height": 100, "width": 100}]
    anns = [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
        {"id": 2, "image_id": 1, "category_id": 2, "bbox": [50, 50, 40, 30], "area": 1200, "iscrowd": 0},
        {"id": 3, "image_id": 2, "category_id": 1, "bbox": [0, 0, 30, 30], "area": 900, "iscrowd": 0},
    ]
    cats = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    return {"images": images, "annotations": anns, "categories": cats}


def test_cocoeval_perfect_detections():
    gt = _gt_dataset()
    dets = [
        {"image_id": a["image_id"], "category_id": a["category_id"], "bbox": a["bbox"], "score": 0.9}
        for a in gt["annotations"]
    ]
    e = COCOEval(gt, "bbox")
    stats = e.evaluate(dets)
    assert stats["AP"] == pytest.approx(1.0, abs=1e-6)
    assert stats["AP50"] == pytest.approx(1.0, abs=1e-6)
    assert stats["AR100"] == pytest.approx(1.0, abs=1e-6)


def test_cocoeval_no_detections():
    gt = _gt_dataset()
    e = COCOEval(gt, "bbox")
    stats = e.evaluate([{"image_id": 1, "category_id": 1, "bbox": [90, 90, 5, 5], "score": 0.5}])
    assert stats["AP"] == pytest.approx(0.0, abs=1e-6)


def test_cocoeval_half_recall():
    """Two gts of cat 1; one matched perfectly, one missed -> AP ~ 0.5."""
    gt = _gt_dataset()
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
    ]
    e = COCOEval(gt, "bbox")
    stats = e.evaluate(dets)
    # cat1: recall 0.5 with precision 1 -> AP ~= 0.5 (101-pt interp includes
    # recall=0.5 point); cat2: no dets -> AP 0. mean = 0.25
    assert stats["AP50"] == pytest.approx(0.25, abs=0.02)


def test_cocoeval_false_positive_ordering():
    """High-scoring FP before TP lowers precision."""
    gt = {
        "images": [{"id": 1, "height": 100, "width": 100}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0}
        ],
        "categories": [{"id": 1, "name": "a"}],
    }
    dets_fp_first = [
        {"image_id": 1, "category_id": 1, "bbox": [70, 70, 10, 10], "score": 0.95},
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
    ]
    dets_tp_first = [
        {"image_id": 1, "category_id": 1, "bbox": [70, 70, 10, 10], "score": 0.5},
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
    ]
    ap_fp_first = COCOEval(gt, "bbox").evaluate(dets_fp_first)["AP50"]
    ap_tp_first = COCOEval(gt, "bbox").evaluate(dets_tp_first)["AP50"]
    assert ap_tp_first > ap_fp_first
    assert ap_tp_first == pytest.approx(1.0, abs=1e-6)
    assert ap_fp_first == pytest.approx(0.5, abs=0.02)


def test_cocoeval_crowd_not_fn():
    """Crowd gt never counts as FN; det matching crowd is ignored."""
    gt = {
        "images": [{"id": 1, "height": 100, "width": 100}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [0, 0, 50, 50], "area": 2500, "iscrowd": 1},
            {"id": 2, "image_id": 1, "category_id": 1, "bbox": [60, 60, 20, 20], "area": 400, "iscrowd": 0},
        ],
        "categories": [{"id": 1, "name": "a"}],
    }
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [60, 60, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [5, 5, 40, 40], "score": 0.8},  # inside crowd
    ]
    stats = COCOEval(gt, "bbox").evaluate(dets)
    assert stats["AP50"] == pytest.approx(1.0, abs=1e-6)


def test_cocoeval_area_ranges():
    gt = _gt_dataset()  # areas: 400 (small), 1200 (medium), 900 (small)
    dets = [
        {"image_id": a["image_id"], "category_id": a["category_id"], "bbox": a["bbox"], "score": 0.9}
        for a in gt["annotations"]
    ]
    stats = COCOEval(gt, "bbox").evaluate(dets)
    assert stats["APs"] == pytest.approx(1.0, abs=1e-6)
    assert stats["APm"] == pytest.approx(1.0, abs=1e-6)
    assert np.isnan(stats["APl"])


def test_box_iou_crowd():
    dets = np.array([[0, 0, 10, 10]], dtype=np.float64)
    gts = np.array([[0, 0, 20, 20]], dtype=np.float64)
    iou_normal = box_iou_xywh(dets, gts, np.array([False]))
    iou_crowd = box_iou_xywh(dets, gts, np.array([True]))
    assert iou_normal[0, 0] == pytest.approx(100 / 400)
    assert iou_crowd[0, 0] == pytest.approx(1.0)


def test_voc_ap_07():
    rec = np.array([0.5])
    prec = np.array([1.0])
    # 11-pt: thresholds 0..0.5 have prec 1 (6 of 11)
    assert voc_ap(rec, prec, True) == pytest.approx(6 / 11)


def test_pq_single_image():
    h, w = 20, 20
    gt = np.zeros((h, w), np.int32)
    gt[:10] = 1  # cat 1
    gt[10:] = 2  # cat 2
    pred = np.zeros((h, w), np.int32)
    pred[:9] = 7   # overlaps gt seg 1 with IoU 9/11... compute: inter=9*20, union=11*20 -> 0.818
    pred[9:] = 8
    gt_seg = [
        {"id": 1, "category_id": 1},
        {"id": 2, "category_id": 2},
    ]
    pred_seg = [
        {"id": 7, "category_id": 1},
        {"id": 8, "category_id": 2},
    ]
    stat = pq_compute_single_image(gt, pred, gt_seg, pred_seg)
    cats = {1: {"isthing": 1}, 2: {"isthing": 0}}
    res = stat.pq_average(cats)
    # seg1: inter 180, union 200+180-180=200 -> 0.9
    # seg2: inter 200, union 200+220-200=220 -> 0.909
    iou1 = 180 / 200
    iou2 = 200 / 220
    assert res["pq"] == pytest.approx((iou1 + iou2) / 2, abs=1e-6)
    assert res["n"] == 2


def test_pq_mismatch_category():
    gt = np.ones((10, 10), np.int32)
    pred = np.ones((10, 10), np.int32) * 5
    stat = pq_compute_single_image(
        gt, pred, [{"id": 1, "category_id": 1}], [{"id": 5, "category_id": 2}]
    )
    res = stat.pq_average({1: {"isthing": 1}, 2: {"isthing": 1}})
    assert res["pq"] == 0.0  # one FN (cat1) + one FP (cat2)


def test_native_matches_python():
    """The C++ fast path must produce identical stats to the python matcher
    (mirrors reference tests/data/test_coco_evaluation.py checking the C++
    path == pycocotools exactly)."""
    from jtsm_tpu.evaluation.fast_eval_api import get_lib

    if get_lib() is None:
        pytest.skip("native cocoeval unavailable")
    rng = np.random.RandomState(3)
    images = [{"id": i, "height": 100, "width": 100} for i in range(6)]
    anns = []
    aid = 1
    for i in range(6):
        for _ in range(rng.randint(1, 5)):
            x, y = rng.rand(2) * 60
            w, h = rng.rand(2) * 60 + 3
            anns.append(
                {
                    "id": aid,
                    "image_id": i,
                    "category_id": int(rng.randint(1, 4)),
                    "bbox": [x, y, w, h],
                    "area": w * h,
                    "iscrowd": int(rng.rand() < 0.15),
                }
            )
            aid += 1
    cats = [{"id": c, "name": str(c)} for c in [1, 2, 3]]
    gt = {"images": images, "annotations": anns, "categories": cats}
    dets = []
    for a in anns:
        if rng.rand() < 0.7:
            jitter = rng.randn(4) * 3
            bb = np.asarray(a["bbox"]) + jitter
            dets.append(
                {
                    "image_id": a["image_id"],
                    "category_id": a["category_id"],
                    "bbox": bb.tolist(),
                    "score": float(rng.rand()),
                }
            )
    for _ in range(10):  # random false positives
        dets.append(
            {
                "image_id": int(rng.randint(0, 6)),
                "category_id": int(rng.randint(1, 4)),
                "bbox": (rng.rand(4) * 40 + 1).tolist(),
                "score": float(rng.rand()),
            }
        )
    s_native = COCOEval(gt, "bbox", use_native=True).evaluate(dets)
    s_python = COCOEval(gt, "bbox", use_native=False).evaluate(dets)
    for k in s_python:
        if np.isnan(s_python[k]):
            assert np.isnan(s_native[k]), k
        else:
            assert s_native[k] == pytest.approx(s_python[k], abs=1e-9), k


def test_rotated_iou_np_matches_jax():
    import jax.numpy as jnp

    from jtsm_tpu.evaluation import pairwise_iou_rotated_np
    from jtsm_tpu.structures.rotated_boxes import pairwise_iou_rotated

    rng = np.random.RandomState(3)
    b1 = np.stack(
        [rng.rand(8) * 80, rng.rand(8) * 80, 5 + rng.rand(8) * 30,
         5 + rng.rand(8) * 30, rng.rand(8) * 360 - 180], axis=1
    ).astype(np.float32)
    b2 = np.stack(
        [rng.rand(6) * 80, rng.rand(6) * 80, 5 + rng.rand(6) * 30,
         5 + rng.rand(6) * 30, rng.rand(6) * 360 - 180], axis=1
    ).astype(np.float32)
    got = pairwise_iou_rotated_np(b1, b2)
    want = np.asarray(pairwise_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_rotated_cocoeval_axis_aligned_equals_plain():
    """Angle-0 XYWHA detections must score identically to the XYWH path."""
    from jtsm_tpu.evaluation import RotatedCOCOEval

    gt = _gt_dataset()
    dets_xywh = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [52, 50, 40, 30], "score": 0.8},
        {"image_id": 2, "category_id": 1, "bbox": [0, 0, 30, 30], "score": 0.7},
        {"image_id": 2, "category_id": 1, "bbox": [60, 60, 10, 10], "score": 0.6},
    ]
    plain = COCOEval(gt, "bbox").evaluate(dets_xywh)
    dets_xywha = [
        dict(d, bbox=[d["bbox"][0] + d["bbox"][2] / 2, d["bbox"][1] + d["bbox"][3] / 2,
                      d["bbox"][2], d["bbox"][3], 0.0])
        for d in dets_xywh
    ]
    rot = RotatedCOCOEval(gt, "bbox").evaluate(dets_xywha)
    for k in plain:
        assert np.isclose(plain[k], rot[k], atol=1e-6, equal_nan=True), (k, plain[k], rot[k])


def test_rotated_coco_evaluator_e2e():
    from jtsm_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from jtsm_tpu.evaluation import RotatedCOCOEvaluator

    name = "_rot_eval_test"
    if name in DatasetCatalog.list():
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)
    DatasetCatalog.register(
        name,
        lambda: [
            {
                "image_id": 1, "height": 100, "width": 100, "file_name": "x.jpg",
                "annotations": [
                    {"bbox": [30, 30, 20, 10, 30.0], "bbox_mode": 4, "category_id": 0,
                     "iscrowd": 0, "area": 200},
                ],
            }
        ],
    )
    MetadataCatalog.get(name).set(thing_classes=["a"])
    ev = RotatedCOCOEvaluator(name, distributed=False)
    ev.reset()
    ev.process(
        {"image_ids": np.array([1]), "orig_sizes": np.array([[100, 100]])},
        {
            "boxes": np.array([[[30, 30, 20, 10, 30.0], [0, 0, 0, 0, 0]]], np.float32),
            "scores": np.array([[0.9, 0.0]], np.float32),
            "classes": np.array([[0, 0]], np.int32),
            "valid": np.array([[True, False]]),
        },
    )
    res = ev.evaluate()
    assert np.isclose(res["bbox"]["AP"], 100.0), res


def test_native_rle_iou_matches_python():
    """csrc/rle.cpp run-merge IoU == full-decode numpy IoU (crowd-aware)."""
    from jtsm_tpu.data import rle
    from jtsm_tpu.data.rle_native import get_lib, rle_iou_batch

    if get_lib() is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.RandomState(7)
    h, w = 120, 90
    def rand(string):
        m = np.zeros((h, w), bool)
        y, x = rng.randint(0, h - 30), rng.randint(0, w - 30)
        m[y : y + rng.randint(4, 30), x : x + rng.randint(4, 30)] = True
        return (rle.rle_string_encode(m) if string else rle.rle_encode(m)), m

    dets, dm = zip(*[rand(i % 2 == 0) for i in range(6)])
    gts, gm = zip(*[rand(i % 2 == 1) for i in range(5)])
    crowd = np.array([False, True, False, False, True])
    native = rle_iou_batch(list(dets), list(gts), crowd, h, w)
    for i in range(6):
        for j in range(5):
            inter = (dm[i] & gm[j]).sum()
            denom = dm[i].sum() if crowd[j] else dm[i].sum() + gm[j].sum() - inter
            want = inter / denom if denom else 0.0
            assert np.isclose(native[i, j], want, atol=1e-12)


def test_lvis_evaluator_e2e(tmp_path):
    """LVISEvaluator end-to-end on a tiny LVIS-format json: detections of
    categories that are neither positively annotated nor listed in an
    image's neg_category_ids are IGNORED (LVIS federated protocol), so a
    spurious high-score detection of an unlisted class cannot create a
    false positive (reference lvis_evaluation.py)."""
    import json as _json

    from jtsm_tpu.data import MetadataCatalog
    from jtsm_tpu.evaluation.lvis_evaluation import LVISEvaluator

    gt = {
        "images": [
            {"id": 1, "width": 50, "height": 50,
             "not_exhaustive_category_ids": [], "neg_category_ids": [2]},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [5, 5, 20, 20],
             "area": 400, "segmentation": [[5, 5, 25, 5, 25, 25, 5, 25]]},
        ],
        "categories": [
            {"id": 1, "name": "a", "frequency": "f"},
            {"id": 2, "name": "b", "frequency": "c"},
            {"id": 3, "name": "c", "frequency": "r"},
        ],
    }
    jf = tmp_path / "lvis_tiny.json"
    jf.write_text(_json.dumps(gt))
    name = "lvis_eval_test_ds"
    MetadataCatalog.get(name).json_file = str(jf)

    ev = LVISEvaluator(name, distributed=False)
    ev.reset()
    outputs = {
        # det 0: perfect match of cat 1 (contiguous id 0)
        # det 1: cat 3 (contiguous 2) — unlisted for this image -> ignored
        # det 2: cat 2 (contiguous 1) — negative list -> a real FP if kept
        "boxes": np.asarray([[[5, 5, 25, 25], [0, 0, 10, 10], [30, 30, 45, 45]]], np.float32),
        "scores": np.asarray([[0.9, 0.95, 0.8]], np.float32),
        "classes": np.asarray([[0, 2, 1]], np.int64),
        "valid": np.asarray([[True, True, True]]),
    }
    inputs = {
        "image_ids": np.asarray([1]),
        "orig_sizes": np.asarray([[50, 50]]),
        "image_sizes": np.asarray([[50, 50]]),
    }
    ev.process(inputs, outputs)
    res = ev.evaluate()
    # cat 1 perfectly detected -> AP 100; the unlisted cat-3 det is dropped
    # (with it kept, cat 3 would contribute AP 0 and drag the mean down)
    assert res["bbox"]["AP"] == 100.0
    # frequency buckets: cat 1 is "f" (perfect) -> APf 100; the "r" and "c"
    # categories have no GT and their dets were ignored -> nan
    assert res["bbox"]["APf"] == 100.0
    assert np.isnan(res["bbox"]["APr"]) and np.isnan(res["bbox"]["APc"])
    assert "AR300" in res["bbox"]  # LVIS maxDets protocol


def test_pascal_voc_evaluator_e2e():
    """PascalVOCDetectionEvaluator end-to-end on a registered toy VOC-style
    dataset: detections matching a ``difficult`` GT are ignored (not false
    positives), and the VOC07 11-point mAP comes out exact (reference
    pascal_voc_evaluation.py semantics)."""
    from jtsm_tpu.data import DatasetCatalog, MetadataCatalog
    from jtsm_tpu.evaluation import PascalVOCDetectionEvaluator

    name = "voc_eval_test_ds"
    dicts = [
        {
            "file_name": "a.jpg", "image_id": "000001", "height": 60, "width": 80,
            "annotations": [
                {"category_id": 0, "bbox": [10, 10, 30, 30], "difficult": False},
                {"category_id": 0, "bbox": [40, 40, 55, 55], "difficult": True},
                {"category_id": 1, "bbox": [0, 0, 20, 20], "difficult": False},
            ],
        }
    ]
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    DatasetCatalog.register(name, lambda: dicts)
    MetadataCatalog.get(name).thing_classes = ["cat", "dog"]
    MetadataCatalog.get(name).year = 2007

    ev = PascalVOCDetectionEvaluator(name)
    ev.reset()
    outputs = {
        "boxes": np.asarray(
            [[[10, 10, 30, 30], [40, 40, 55, 55], [0, 0, 20, 20]]], np.float32
        ),
        "scores": np.asarray([[0.9, 0.8, 0.95]], np.float32),
        "classes": np.asarray([[0, 0, 1]], np.int64),
        "valid": np.asarray([[True, True, True]]),
    }
    ev.process({"image_ids": np.asarray(["000001"], object)}, outputs)
    res = ev.evaluate()
    # class 0: the non-difficult GT is recalled; the difficult-GT det is
    # ignored. class 1: perfect. VOC07 metric -> 100 each.
    np.testing.assert_allclose(res["bbox"]["AP50"], 100.0)
    # CorLoc: top-scoring det per image hits a GT for both classes -> 100
    np.testing.assert_allclose(res["bbox CorLoc"]["CL50"], 100.0)


def test_pascal_voc_corloc_top_det_only():
    """CorLoc judges only the single highest-scoring detection per image: a
    mislocalized top det makes the image wrong even when a lower-scoring det
    hits the GT (reference pascal_voc_evaluation.py:358-452, T/F sets keyed
    by image)."""
    from jtsm_tpu.evaluation.pascal_voc_evaluation import (
        voc_eval_class,
        voc_eval_corloc_class,
    )

    gts = {"im1": {"bbox": [[10, 10, 30, 30]], "difficult": [False]}}
    dets = [
        {"image_id": "im1", "bbox": [50, 50, 70, 70], "score": 0.9},  # miss
        {"image_id": "im1", "bbox": [10, 10, 30, 30], "score": 0.5},  # hit
    ]
    assert voc_eval_corloc_class(dets, gts, 0.5) == 0.0
    # ...while AP still credits the lower-scoring hit
    _, _, ap = voc_eval_class(dets, gts, 0.5, use_07_metric=False)
    assert ap > 0.0
    # all-difficult images are excluded from both numerator and denominator
    gts2 = {
        "im1": {"bbox": [[10, 10, 30, 30]], "difficult": [True]},
        "im2": {"bbox": [[10, 10, 30, 30]], "difficult": [False]},
    }
    dets2 = [
        {"image_id": "im1", "bbox": [10, 10, 30, 30], "score": 0.9},
        {"image_id": "im2", "bbox": [10, 10, 30, 30], "score": 0.8},
    ]
    assert voc_eval_corloc_class(dets2, gts2, 0.5) == 1.0


def test_keypoint_oks_sigmas_plumbed():
    """TEST.KEYPOINT_OKS_SIGMAS actually changes OKS matching (regression:
    the sigmas arg hit a broken `global` stub and was ignored)."""
    from jtsm_tpu.evaluation.cocoeval import COCOEval

    gt = {
        "images": [{"id": 1, "width": 100, "height": 100}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
             "bbox": [10, 10, 40, 40], "area": 1600,
             "keypoints": [20, 20, 2, 30, 30, 2, 40, 40, 2], "num_keypoints": 3}
        ],
        "categories": [{"id": 1, "name": "p"}],
    }
    det = [{"image_id": 1, "category_id": 1, "score": 0.9,
            "keypoints": [22, 20, 1, 30, 33, 1, 40, 40, 1], "bbox": [10, 10, 40, 40]}]
    tight = COCOEval(gt, "keypoints", kpt_oks_sigmas=[0.01] * 3).evaluate(det)
    loose = COCOEval(gt, "keypoints", kpt_oks_sigmas=[0.5] * 3).evaluate(det)
    assert loose["AP"] == 1.0 and tight["AP"] == 0.0
