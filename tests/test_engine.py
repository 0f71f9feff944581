import json
import os

import numpy as np
import pytest
from PIL import Image

from jtsm_tpu.config import get_cfg
from jtsm_tpu.data import DatasetCatalog
from jtsm_tpu.data.datasets import register_coco_instances
from jtsm_tpu.engine import DefaultTrainer, default_argument_parser


@pytest.fixture(scope="module")
def tiny_coco_train(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_train")
    img_dir = root / "images"
    img_dir.mkdir()
    images, annotations = [], []
    rng = np.random.RandomState(0)
    for i in range(6):
        w, h = 64, 48
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        fn = f"img{i}.jpg"
        Image.fromarray(arr).save(img_dir / fn)
        images.append({"id": i, "file_name": fn, "height": h, "width": w})
        for j in range(2):
            x, y, bw, bh = 5 + 10 * j, 5 + 5 * j, 20, 15
            annotations.append(
                {
                    "id": len(annotations) + 1,
                    "image_id": i,
                    "category_id": j + 1,
                    "bbox": [x, y, bw, bh],
                    "area": bw * bh,
                    "iscrowd": 0,
                    "segmentation": [[x, y, x + bw, y, x + bw, y + bh, x, y + bh]],
                }
            )
    js = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    }
    json_path = root / "train.json"
    with open(json_path, "w") as f:
        json.dump(js, f)
    name = "tiny_coco_engine"
    if name not in DatasetCatalog:
        register_coco_instances(name, {}, str(json_path), str(img_dir))
    return name


def _tiny_train_cfg(name, out_dir):
    cfg = get_cfg()
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.RESNETS.NORM = "FrozenBN"
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 64
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16], [32], [64], [128], [256]]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 2
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 64
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 32
    cfg.MODEL.MASK_ON = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.IMAGE_BUCKETS = [[64, 64]]
    cfg.TPU.MAX_GT_INSTANCES = 8
    cfg.INPUT.MIN_SIZE_TRAIN = (48,)
    cfg.INPUT.MAX_SIZE_TRAIN = 64
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 64
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.BASE_LR = 1e-5
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 3
    cfg.OUTPUT_DIR = out_dir
    cfg.SEED = 0
    return cfg


def test_default_trainer_smoke(tiny_coco_train, tmp_path):
    cfg = _tiny_train_cfg(tiny_coco_train, str(tmp_path / "out"))
    trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=False)
    trainer.train()
    # three iterations ran, final checkpoint written
    assert trainer.iter == 3
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "model_final.ckpt"))
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "last_checkpoint"))
    # metrics written
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))

    # params actually changed
    import jax

    state = trainer.state
    assert int(state.step) == 3

    # evaluation path end-to-end (AP will be ~0 — untrained — but must run)
    results = DefaultTrainer.test(cfg, trainer.model, variables=trainer._trainer.state_variables())
    assert "bbox" in results
    assert "AP" in results["bbox"]


def test_argument_parser():
    parser = default_argument_parser()
    args = parser.parse_args(["--config-file", "x.yaml", "SOLVER.BASE_LR", "0.01"])
    assert args.config_file == "x.yaml"
    assert args.opts == ["SOLVER.BASE_LR", "0.01"]


def test_nan_loss_guard():
    """The trainer raises FloatingPointError when losses go non-finite
    (reference train_loop.py:278-282)."""
    import numpy as np
    import pytest

    from jtsm_tpu.engine.trainer import SimpleTrainer
    from jtsm_tpu.utils.events import EventStorage

    t = SimpleTrainer.__new__(SimpleTrainer)
    t.iter = 5
    t._pending_metrics = {"loss_cls": np.float32("nan"), "loss_reg": np.float32(1.0)}
    with EventStorage(0) as storage:
        t.storage = storage
        with pytest.raises(FloatingPointError, match="iteration=4"):
            t._write_metrics({"loss_cls": 0.5}, data_time=0.0)

    # finite losses pass through
    t._pending_metrics = {"loss_cls": np.float32(0.5)}
    with EventStorage(0) as storage:
        t.storage = storage
        t._write_metrics({"loss_cls": 0.4}, data_time=0.0)


def test_resume_restores_optimizer_state_and_rng(tiny_coco_train, tmp_path):
    """Resume continues the exact trajectory: momentum buffers, optax
    schedule counters and the sampling rng are checkpointed and restored
    (regression: opt_state reset to zeros on resume, silently restarting
    the LR schedule and momentum mid-run)."""
    import jax
    import numpy as np

    cfg = _tiny_train_cfg(tiny_coco_train, str(tmp_path / "out_resume"))
    trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=False)
    trainer.train()
    saved_state = trainer.state

    # fresh process-equivalent: new trainer, resume from last_checkpoint
    cfg2 = _tiny_train_cfg(tiny_coco_train, cfg.OUTPUT_DIR)
    trainer2 = DefaultTrainer(cfg2)
    trainer2.resume_or_load(resume=True)
    assert trainer2.start_iter == 3

    # momentum buffers equal the live trainer's (and are not all-zero)
    def leaves(t):
        return [np.asarray(x) for x in jax.tree_util.tree_leaves(t)]

    got = leaves(trainer2.state.opt_state)
    want = leaves(saved_state.opt_state)
    assert len(got) == len(want)
    assert any(np.abs(w).max() > 0 for w in want if w.dtype.kind == "f")
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    # rng stream continues, not reset to the seed key
    assert np.array_equal(
        np.asarray(jax.random.key_data(trainer2.state.rng)),
        np.asarray(jax.random.key_data(saved_state.rng)),
    )


def test_precise_bn_wired_and_updates_stats(tiny_coco_train, tmp_path):
    """TEST.PRECISE_BN.ENABLED registers the PreciseBN hook (it was a dead
    knob) and update_precise_bn recomputes population BN statistics."""
    import jax
    import numpy as np

    from jtsm_tpu.engine import hooks as hooks_mod

    cfg = _tiny_train_cfg(tiny_coco_train, str(tmp_path / "out_pbn"))
    cfg.MODEL.RESNETS.NORM = "BN"
    cfg.TEST.PRECISE_BN.ENABLED = True
    cfg.TEST.PRECISE_BN.NUM_ITER = 2
    cfg.TEST.EVAL_PERIOD = 100
    trainer = DefaultTrainer(cfg)
    assert any(isinstance(h, hooks_mod.PreciseBN) for h in trainer._hooks)

    before = [np.asarray(x) for x in jax.tree_util.tree_leaves(trainer.state.batch_stats)]
    assert before, "BN model must carry batch_stats"
    trainer.update_precise_bn(2)
    after = [np.asarray(x) for x in jax.tree_util.tree_leaves(trainer._trainer.state.batch_stats)]
    assert any(not np.array_equal(b, a) for b, a in zip(before, after))


def test_vis_period_puts_training_images(tiny_coco_train, tmp_path):
    """cfg.VIS_PERIOD > 0 registers the training-sample visualization hook
    and images land in EventStorage for the TensorBoard writer (reference
    rcnn.py visualize_training; the knob was dead)."""
    cfg = _tiny_train_cfg(tiny_coco_train, str(tmp_path / "out_vis"))
    cfg.VIS_PERIOD = 2
    trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=False)

    seen = []
    import jtsm_tpu.utils.events as ev

    orig = ev.EventStorage.put_image

    def spy(self, name, img):
        seen.append((name, img.shape))
        return orig(self, name, img)

    ev.EventStorage.put_image = spy
    try:
        trainer.train()
    finally:
        ev.EventStorage.put_image = orig
    # iters 0 and 2 fire at period 2 over 3 iters
    assert len(seen) == 2
    name, shape = seen[0]
    assert name == "training_samples" and shape[0] == 3  # CHW


def test_sharded_eval_matches_single_device(tiny_coco_train, tmp_path):
    """TEST.IMS_PER_BATCH > 1 shards the eval batch over the data mesh
    (4 of the 8 virtual devices here) and pads/trims the final partial
    batch (6 images -> 4 + 2-padded-to-4); results must match the plain
    one-image-per-step eval."""
    cfg = _tiny_train_cfg(tiny_coco_train, str(tmp_path / "out_shard"))
    trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=False)
    variables = trainer._trainer.state_variables()

    res1 = DefaultTrainer.test(cfg, trainer.model, variables=variables)

    cfg4 = cfg.clone()
    cfg4.TEST.IMS_PER_BATCH = 4
    res4 = DefaultTrainer.test(cfg4, trainer.model, variables=variables)

    assert set(res1) == set(res4)
    for task in res1:
        for k, v in res1[task].items():
            v4 = res4[task][k]
            if np.isnan(v) and np.isnan(v4):
                continue
            np.testing.assert_allclose(v4, v, rtol=1e-3, atol=1e-3, err_msg=(task, k))


def test_compilation_cache_knob(tmp_path):
    """TPU.COMPILATION_CACHE_DIR wires the persistent XLA compilation cache
    in default_setup (JTSM_XLA_CACHE_DIR env overrides; '' disables)."""
    import types

    import jax

    from jtsm_tpu.engine.defaults import default_setup

    prev = jax.config.jax_compilation_cache_dir
    try:
        cfg = get_cfg()
        cfg.OUTPUT_DIR = str(tmp_path / "out")
        cache = str(tmp_path / "xla_cache")
        cfg.TPU.COMPILATION_CACHE_DIR = cache
        default_setup(cfg, types.SimpleNamespace())
        assert jax.config.jax_compilation_cache_dir == cache

        env_cache = str(tmp_path / "env_cache")
        os.environ["JTSM_XLA_CACHE_DIR"] = env_cache
        try:
            default_setup(cfg, types.SimpleNamespace())
            assert jax.config.jax_compilation_cache_dir == env_cache
        finally:
            del os.environ["JTSM_XLA_CACHE_DIR"]

        # empty string disables (leaves the current value untouched)
        cfg.TPU.COMPILATION_CACHE_DIR = ""
        default_setup(cfg, types.SimpleNamespace())
        assert jax.config.jax_compilation_cache_dir == env_cache
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
