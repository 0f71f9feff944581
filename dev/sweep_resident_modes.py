"""Sweep the resident ROIAlign kernel's contraction modes on the real chip
at the inference-bench shape (800x1344 pyramid, C=256, 1000 ROIs/img).

Usage: python dev/sweep_resident_modes.py  [B=8 K=1000 MODES=a,b,c]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jtsm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from jtsm_tpu.ops.pallas import roi_align_kernel as rk


def main():
    b = int(os.environ.get("B", "8"))
    k = int(os.environ.get("K", "1000"))
    h0, w0 = 200, 336  # p2 of 800x1344
    c = 256
    scales = (0.25, 0.125, 0.0625, 0.03125)
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(
            rng.rand(b, h0 // (1 << l), w0 // (1 << l), c), jnp.bfloat16
        )
        for l in range(4)
    ]
    boxes = []
    for _ in range(b):
        x0 = rng.rand(k) * 1200
        y0 = rng.rand(k) * 700
        w = rng.rand(k) * 300 + 8
        h = rng.rand(k) * 300 + 8
        boxes.append(np.stack([x0, y0, x0 + w, y0 + h], 1))
    boxes = jnp.asarray(np.stack(boxes).reshape(-1, 4), jnp.float32)
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
    from jtsm_tpu.modeling.poolers import assign_boxes_to_levels
    levels = assign_boxes_to_levels(boxes, min_level=2, max_level=5, canonical_box_size=224, canonical_level=4)

    modes = os.environ.get(
        "MODES",
        "yfirst_bf16_copy,yfirst_ybatch_bf16_copy,kron_bf16_copy,xfirst_bf16,yfirst_copy",
    ).split(",")

    ref = None
    for mode in modes:
        os.environ["JTSM_RESIDENT_MODE"] = mode
        try:
            out = rk.roi_align_multilevel_pallas(
                feats, scales, boxes, bidx, levels,
                output_size=7, sampling_ratio=2, rois_per_image=k,
            )
            jax.block_until_ready(out)
            # timed
            t0 = time.time()
            iters = 5
            outs = [
                rk.roi_align_multilevel_pallas(
                    feats, scales, boxes, bidx, levels,
                    output_size=7, sampling_ratio=2, rois_per_image=k,
                )
                for _ in range(iters)
            ]
            jax.block_until_ready(outs)
            dt = (time.time() - t0) / iters
            err = ""
            if ref is None and mode.startswith("yfirst"):
                ref = np.asarray(out, np.float32)
            elif ref is not None:
                d = np.abs(np.asarray(out, np.float32) - ref)
                err = f"  max|d|={d.max():.2e}"
            print(
                f"{mode:28s} {dt * 1e3:7.2f} ms  ({dt / (b * k) * 1e6:.2f} us/ROI){err}"
            )
        except Exception as e:
            print(f"{mode:28s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
