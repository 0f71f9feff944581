import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jtsm_tpu.ops import roi_align, roi_align_batched


def roi_align_ref(feat_hwc, boxes, out_size, spatial_scale, sampling_ratio, aligned):
    """Slow numpy reference implementing the documented ROIAlign semantics
    (mirrors the reference CPU kernel layers/csrc/ROIAlign/ROIAlign_cpu.cpp)."""
    h, w, c = feat_hwc.shape
    r = len(boxes)
    out = np.zeros((r, out_size, out_size, c), dtype=np.float64)
    off = 0.5 if aligned else 0.0
    for ri, box in enumerate(boxes):
        x0, y0, x1, y1 = box * spatial_scale - off
        rw, rh = x1 - x0, y1 - y0
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / out_size, rh / out_size
        for py in range(out_size):
            for px in range(out_size):
                acc = np.zeros(c)
                for iy in range(sampling_ratio):
                    for ix in range(sampling_ratio):
                        y = y0 + (py + (iy + 0.5) / sampling_ratio) * bh
                        x = x0 + (px + (ix + 0.5) / sampling_ratio) * bw
                        acc += bilinear(feat_hwc, y, x)
                out[ri, py, px] = acc / (sampling_ratio**2)
    return out


def bilinear(feat, y, x):
    h, w, _ = feat.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[-1])
    y = max(y, 0.0)
    x = max(x, 0.0)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    if y0 >= h - 1:
        y0, fy = h - 2, 1.0
        if h == 1:
            y0, fy = 0, 0.0
    else:
        fy = y - y0
    if x0 >= w - 1:
        x0, fx = w - 2, 1.0
        if w == 1:
            x0, fx = 0, 0.0
    else:
        fx = x - x0
    v = (
        feat[y0, x0] * (1 - fy) * (1 - fx)
        + feat[y0, x0 + 1] * (1 - fy) * fx
        + feat[y0 + 1, x0] * fy * (1 - fx)
        + feat[y0 + 1, x0 + 1] * fy * fx
    )
    return v


def test_roi_align_matches_reference_semantics():
    rng = np.random.RandomState(0)
    feat = rng.rand(24, 32, 3).astype(np.float32)
    boxes = np.array(
        [
            [4.0, 4.0, 20.0, 16.0],
            [0.0, 0.0, 31.0, 23.0],
            [10.5, 3.2, 25.9, 22.8],
            [30.0, 20.0, 40.0, 30.0],  # partially outside
        ],
        dtype=np.float32,
    )
    for aligned in [True, False]:
        got = np.asarray(
            roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 1.0, 2, aligned)
        )
        exp = roi_align_ref(feat, boxes, 7, 1.0, 2, aligned)
        np.testing.assert_allclose(got, exp, atol=1e-4)


def test_roi_align_spatial_scale():
    rng = np.random.RandomState(1)
    feat = rng.rand(16, 16, 2).astype(np.float32)
    boxes = np.array([[8.0, 8.0, 56.0, 40.0]], dtype=np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 5, 0.25, 2, True))
    exp = roi_align_ref(feat, boxes, 5, 0.25, 2, True)
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_roi_align_batched_no_bleed():
    """A ROI at the bottom edge of image 0 must not read image 1."""
    feat = np.zeros((2, 8, 8, 1), dtype=np.float32)
    feat[1] = 100.0
    boxes = np.array([[0.0, 4.0, 8.0, 8.0]], dtype=np.float32)
    out = np.asarray(
        roi_align_batched(
            jnp.asarray(feat), jnp.asarray(boxes), jnp.asarray([0]), 4, 1.0, 2, True
        )
    )
    assert np.abs(out).max() < 1e-6


def test_roi_align_batched_selects_image():
    feat = np.stack(
        [np.full((8, 8, 1), v, dtype=np.float32) for v in [1.0, 2.0, 3.0]]
    )
    boxes = np.array([[2.0, 2.0, 6.0, 6.0]] * 3, dtype=np.float32)
    out = np.asarray(
        roi_align_batched(
            jnp.asarray(feat), jnp.asarray(boxes), jnp.asarray([0, 1, 2]), 2, 1.0, 2, True
        )
    )
    np.testing.assert_allclose(out[:, 0, 0, 0], [1.0, 2.0, 3.0])


def test_roi_align_differentiable():
    feat = jnp.ones((8, 8, 2))
    boxes = jnp.asarray([[1.0, 1.0, 6.0, 6.0]])

    def f(x):
        return roi_align(x, boxes, 4, 1.0, 2, True).sum()

    g = jax.grad(f)(feat)
    assert g.shape == feat.shape
    assert float(jnp.abs(g).sum()) > 0


def test_resident_pallas_kernel_interpret(monkeypatch):
    """Level-resident Pallas ROIAlign == XLA formulation at matched (bumped)
    levels, via TPU interpret mode on CPU (kernel file:
    jtsm_tpu/ops/pallas/roi_align_kernel.py _make_resident_kernel)."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from jtsm_tpu.modeling.poolers import assign_boxes_to_levels
    from jtsm_tpu.ops.pallas.roi_align_kernel import (
        _bumped_levels,
        roi_align_multilevel_pallas,
    )
    from jtsm_tpu.ops.roi_align import roi_align_multilevel

    monkeypatch.setenv("JTSM_RESIDENT_MODE", "yfirst_copy")
    rng = np.random.RandomState(0)
    b, k, c = 1, 4, 256
    feats = [
        jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
        for h, w in ((48, 48), (24, 24))
    ]
    scales = (0.25, 0.125)
    x0 = rng.uniform(0, 150, (b * k,))
    y0 = rng.uniform(0, 150, (b * k,))
    boxes = jnp.asarray(
        np.stack(
            [x0, y0, x0 + rng.uniform(4, 40, (b * k,)), y0 + rng.uniform(4, 40, (b * k,))],
            -1,
        ),
        jnp.float32,
    )
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
    levels = assign_boxes_to_levels(boxes, 2, 3)
    with pltpu.force_tpu_interpret_mode():
        out = roi_align_multilevel_pallas(
            feats, scales, boxes, bidx, levels, 7, 2, k
        )
    blvl = _bumped_levels(feats, scales, boxes, levels)
    ref = roi_align_multilevel(
        tuple(feats), scales, boxes, bidx, blvl, (7, 7), 2, True
    )
    assert float(jnp.abs(out - ref).max()) < 1e-4


def test_resident_pallas_backward_interpret(monkeypatch):
    """Resident Pallas ROIAlign backward (VMEM-accumulated window grads,
    _make_resident_bwd_kernel) == linear-transpose of the XLA formulation,
    in interpret mode, incl. the SMEM image-chunked path."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from jtsm_tpu.modeling.poolers import assign_boxes_to_levels
    from jtsm_tpu.ops.pallas.roi_align_kernel import (
        _bumped_levels,
        roi_align_multilevel_pallas,
    )
    from jtsm_tpu.ops.roi_align import roi_align_multilevel

    monkeypatch.setenv("JTSM_RESIDENT_MODE", "yfirst_copy")
    monkeypatch.setenv("JTSM_RESIDENT_MAX_SMEM_ROIS", "4")  # force 2 chunks
    rng = np.random.RandomState(0)
    b, k, c = 2, 4, 256
    feats = [
        jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
        for h, w in ((48, 48), (24, 24))
    ]
    scales = (0.25, 0.125)
    x0 = rng.uniform(0, 150, (b * k,))
    y0 = rng.uniform(0, 150, (b * k,))
    boxes = jnp.asarray(
        np.stack(
            [x0, y0, x0 + rng.uniform(4, 120, (b * k,)), y0 + rng.uniform(4, 120, (b * k,))],
            -1,
        ),
        jnp.float32,
    )
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
    levels = assign_boxes_to_levels(boxes, 2, 3)
    blvl = _bumped_levels(feats, scales, boxes, levels)
    cot = jnp.asarray(rng.randn(b * k, 7, 7, c), jnp.float32)

    def loss_pallas(fs):
        out = roi_align_multilevel_pallas(fs, scales, boxes, bidx, levels, 7, 2, k)
        return jnp.sum(out * cot)

    def loss_ref(fs):
        out = roi_align_multilevel(
            tuple(fs), scales, boxes, bidx, blvl, (7, 7), 2, True
        )
        return jnp.sum(out * cot)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pallas)(feats)
    gr = jax.grad(loss_ref)(feats)
    for a, r in zip(gp, gr):
        assert float(jnp.abs(r).max()) > 0  # both levels exercised
        assert float(jnp.abs(a - r).max()) < 1e-3


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/detectron2"), reason="reference absent"
)
@pytest.mark.parametrize("aligned", [True, False])
def test_adaptive_sampling_matches_reference_cpu_op(aligned):
    """sampling_ratio=0 (per-ROI adaptive grid, ROIAlign_cpu.cpp:181) must
    match the reference's own compiled CPU kernel exactly, including ROIs
    whose bins need 1..4 samples per axis."""
    from tests.refkit.stubs import _build_ref_ops

    torch = pytest.importorskip("torch")
    ref_ops = _build_ref_ops()

    rng = np.random.RandomState(0)
    feats = rng.randn(2, 24, 32, 8).astype(np.float32)  # (B, H, W, C)
    # box sizes spanning adaptive ratios 1..4 at scale 0.5, output 7:
    # bin px = size*0.5/7 -> sizes up to 7*4/0.5=56
    sizes = rng.uniform(3.0, 55.0, (40, 2)).astype(np.float32)
    x0y0 = rng.uniform(-5.0, 40.0, (40, 2)).astype(np.float32)
    boxes = np.concatenate([x0y0, x0y0 + sizes], axis=1)
    bidx = rng.randint(0, 2, (40,)).astype(np.int32)

    got = roi_align_batched(
        jnp.asarray(feats), jnp.asarray(boxes), jnp.asarray(bidx),
        7, 0.5, 0, aligned,
    )
    rois = torch.from_numpy(
        np.concatenate([bidx[:, None].astype(np.float32), boxes], axis=1)
    )
    want = ref_ops.roi_align_forward(
        torch.from_numpy(feats.transpose(0, 3, 1, 2).copy()),
        rois, 0.5, 7, 7, 0, aligned,
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5
    )
