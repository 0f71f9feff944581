"""Parity + timing for the level-resident Pallas ROIAlign vs the XLA
formulation and the windowed kernel. Runs on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jtsm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from jtsm_tpu.modeling.poolers import assign_boxes_to_levels
from jtsm_tpu.ops.pallas.roi_align_kernel import roi_align_multilevel_pallas
from jtsm_tpu.ops.roi_align import roi_align_multilevel


def main():
    b = int(os.environ.get("B", "4"))
    k = int(os.environ.get("K", "1000"))
    h0, w0 = 100, 168
    c = 256
    scales = (0.25, 0.125, 0.0625, 0.03125)
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(
            rng.randn(b, max(h0 >> l, 1), max(w0 >> l, 1), c), jnp.bfloat16
        )
        for l in range(4)
    ]
    img_h, img_w = h0 * 4, w0 * 4
    x0 = rng.uniform(0, img_w - 2, (b * k,))
    y0 = rng.uniform(0, img_h - 2, (b * k,))
    bw = rng.uniform(2, 300, (b * k,))
    bh = rng.uniform(2, 300, (b * k,))
    boxes = jnp.asarray(
        np.stack(
            [x0, y0, np.minimum(x0 + bw, img_w), np.minimum(y0 + bh, img_h)], -1
        ),
        jnp.float32,
    )
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
    levels = assign_boxes_to_levels(boxes, 2, 5)

    from jtsm_tpu.ops.pallas.roi_align_kernel import _bumped_levels

    blvl = _bumped_levels(feats, scales, boxes, levels)
    ref_fn = jax.jit(
        lambda f, bx: roi_align_multilevel(
            tuple(f), scales, bx, bidx, blvl, (7, 7), 2, True
        )
    )
    win_fn = jax.jit(
        lambda f, bx: roi_align_multilevel_pallas(
            list(f), scales, bx, bidx, levels, 7, 2, None
        )
    )

    def make_res(mode):
        def fn(f, bx):
            os.environ["JTSM_RESIDENT_MODE"] = mode
            return roi_align_multilevel_pallas(
                list(f), scales, bx, bidx, levels, 7, 2, k
            )
        return jax.jit(fn)

    modes = os.environ.get("MODES", "xfirst,yfirst,yfirst_copy").split(",")
    fns = [("xla", ref_fn), ("windowed", win_fn)] + [
        (m, make_res(m)) for m in modes
    ]

    ref = np.asarray(ref_fn(feats, boxes), np.float32)
    for name, fn in fns[1:]:
        out = np.asarray(fn(feats, boxes), np.float32)
        diff = np.abs(out - ref)
        denom = np.maximum(np.abs(ref), 1e-2)
        print(f"{name}: max abs diff {diff.max():.4f}  max rel {np.nanmax(diff/denom):.4f}")

    for name, fn in fns:
        fn(feats, boxes)  # warm
        t0 = time.time()
        iters = 20
        outs = [fn(feats, boxes) for _ in range(iters)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / iters * 1e3
        print(f"{name}: {dt:.2f} ms  ({dt / (b * k) * 1e3:.2f} us/roi incl. overhead)")


if __name__ == "__main__":
    main()
