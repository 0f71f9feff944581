"""Visualizer, FLOP analysis, export, verify_results (mirrors reference
tests/test_visualizer.py, test_model_analysis.py, test_export_*.py,
evaluation/testing.py usage)."""

import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from jtsm_tpu.config import get_cfg


def test_visualizer_draws_everything():
    from jtsm_tpu.utils.visualizer import Visualizer

    img = (np.random.RandomState(0).rand(64, 80, 3) * 255).astype(np.uint8)
    v = Visualizer(img)
    preds = {
        "boxes": np.asarray([[5.0, 5, 30, 40], [10, 10, 50, 60]]),
        "scores": np.asarray([0.9, 0.8]),
        "classes": np.asarray([0, 1]),
        "valid": np.asarray([True, True]),
    }
    v.draw_instance_predictions(preds)
    v.draw_sem_seg(np.random.RandomState(1).randint(0, 3, (64, 80)))
    v.draw_keypoints(np.asarray([[20.0, 20, 2], [25, 25, 2]]))
    out = v.get_output().get_image()
    assert out.shape == img.shape and out.dtype == np.uint8
    # something was actually drawn
    assert (out != img).any()


def test_visualizer_panoptic_and_dataset_dict(tmp_path):
    from jtsm_tpu.utils.visualizer import Visualizer

    img = np.zeros((32, 32, 3), np.uint8)
    pan = np.zeros((32, 32), np.int64)
    pan[:16] = 1
    v = Visualizer(img)
    v.draw_panoptic_seg(pan, [{"id": 1, "category_id": 0, "isthing": True}])
    d = {
        "annotations": [
            {"bbox": [2, 2, 10, 10], "bbox_mode": 1, "category_id": 0}
        ]
    }
    v.draw_dataset_dict(d)
    p = str(tmp_path / "vis.png")
    v.get_output().save(p)
    assert os.path.exists(p)


def test_parameter_and_flop_count():
    from jtsm_tpu.utils.analysis import (
        activation_count,
        flop_count,
        parameter_count,
        parameter_count_table,
    )

    params = {"dense": {"kernel": jnp.zeros((8, 4)), "bias": jnp.zeros((4,))}}
    assert parameter_count(params) == 36
    table = parameter_count_table(params)
    assert "dense" in table

    def f(x):
        return x @ jnp.zeros((8, 4))

    fl = flop_count(f, jnp.zeros((2, 8)))
    assert fl > 0
    assert activation_count(f, jnp.zeros((2, 8))) >= 0


def test_export_stablehlo(tmp_path):
    """TPUTracer exports a jittable model to StableHLO text + jax.export
    bytes (reference export/api.py Caffe2Tracer analog)."""
    import flax.linen as nn

    from jtsm_tpu.export.api import TPUTracer

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, batch, train=False):
            x = nn.Conv(4, (3, 3), name="conv")(batch["image"])
            return {"out": x.mean(axis=(1, 2))}

    model = Tiny()
    batch = {"image": jnp.zeros((1, 16, 16, 3))}
    variables = model.init(jax.random.key(0), batch)
    tracer = TPUTracer(get_cfg(), model, variables, batch)
    out = str(tmp_path / "model.stablehlo")
    text = tracer.export_stablehlo(out)
    assert "stablehlo" in text or "mhlo" in text or "func" in text
    assert os.path.exists(out) and open(out).read() == text
    blob = tracer.export_jax_exported(str(tmp_path / "model.jaxexp"))
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0


def test_verify_results():
    from jtsm_tpu.evaluation.testing import verify_results

    cfg = get_cfg()
    cfg.TEST.EXPECTED_RESULTS = [["bbox", "AP", 50.0, 1.0]]
    assert verify_results(cfg, {"bbox": {"AP": 50.5}})
    # failures terminate the process (reference testing.py:58 sys.exit) so
    # dev gate scripts report them
    with pytest.raises(SystemExit):
        verify_results(cfg, {"bbox": {"AP": 40.0}})
    with pytest.raises(SystemExit):
        verify_results(cfg, {"bbox": {"AP": float("nan")}})
    cfg2 = get_cfg()
    assert verify_results(cfg2, {})  # no expectations -> pass
