"""Output resolution mapping (reference: detectron2/modeling/postprocessing.py
``detector_postprocess``, ``sem_seg_postprocess``)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..structures.boxes import clip_boxes

Array = jax.Array


def detector_postprocess_batched(
    detections: Dict[str, Array],
    image_sizes: Array,  # (B, 2) network-input true sizes
    orig_sizes: Array,  # (B, 2) original image sizes
) -> Dict[str, Array]:
    """Rescale detection boxes from network-input coords to original-image
    coords (reference postprocessing.py:detector_postprocess). Masks stay as
    (D, S, S) ROI probabilities; pasting happens in `ops.paste_masks` at the
    original resolution (host or device side)."""
    scale = orig_sizes.astype(jnp.float32) / jnp.maximum(
        image_sizes.astype(jnp.float32), 1.0
    )  # (B, 2) h_scale, w_scale
    sx = scale[:, 1][:, None]
    sy = scale[:, 0][:, None]
    boxes = detections["boxes"]
    if boxes.shape[-1] == 5:
        # rotated (cx, cy, w, h, a): anisotropic scaling skews the box; fit
        # a rotated rect like the reference (RotatedBoxes.scale —
        # structures/rotated_boxes.py:390): edge midpoints transform, w/h/
        # angle re-derived from them. No clip (rotated boxes may overhang).
        theta = boxes[..., 4] * (jnp.pi / 180.0)
        c, s = jnp.cos(theta), jnp.sin(theta)
        boxes = jnp.stack(
            [
                boxes[..., 0] * sx,
                boxes[..., 1] * sy,
                boxes[..., 2] * jnp.sqrt((sx * c) ** 2 + (sy * s) ** 2),
                boxes[..., 3] * jnp.sqrt((sx * s) ** 2 + (sy * c) ** 2),
                jnp.arctan2(sx * s, sy * c) * (180.0 / jnp.pi),
            ],
            axis=-1,
        )
    else:
        boxes = jnp.stack(
            [
                boxes[..., 0] * sx,
                boxes[..., 1] * sy,
                boxes[..., 2] * sx,
                boxes[..., 3] * sy,
            ],
            axis=-1,
        )
        boxes = jax.vmap(clip_boxes)(boxes, orig_sizes)
    out = dict(detections)
    out["boxes"] = boxes
    if boxes.shape[-1] == 4 and "valid" in out:
        # reference postprocessing.py:61 drops boxes that clipped to empty
        # (``results[output_boxes.nonempty()]``); here they turn invalid
        nonempty = (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])
        out["valid"] = out["valid"] & nonempty
    if "keypoints" in detections:
        # (B, D, K, 4) = (x, y, logit, prob): x/y follow the box rescale
        kp = detections["keypoints"]
        out["keypoints"] = jnp.concatenate(
            [
                kp[..., 0:1] * sx[..., None, None],
                kp[..., 1:2] * sy[..., None, None],
                kp[..., 2:],
            ],
            axis=-1,
        )
    return out


def sem_seg_postprocess(result: Array, img_size, output_height, output_width) -> Array:
    """Crop the padded logits to the true size and resize to output size."""
    from ..layers.wrappers import interpolate_bilinear

    result = result[: img_size[0], : img_size[1], :]
    return interpolate_bilinear(result[None], (output_height, output_width))[0]


def detector_postprocess(
    detections: Dict[str, Array],
    output_height: int,
    output_width: int,
    image_size=None,
) -> Dict[str, Array]:
    """Per-image parity wrapper over :func:`detector_postprocess_batched`
    (reference postprocessing.py ``detector_postprocess(results, H, W)``).
    ``image_size`` is the network-input true size; defaults to
    ``detections["image_size"]``."""
    if image_size is None:
        image_size = detections["image_size"]
    batched = {
        k: v[None] for k, v in detections.items() if k != "image_size"
    }
    out = detector_postprocess_batched(
        batched,
        jnp.asarray([image_size], jnp.int32),
        jnp.asarray([[output_height, output_width]], jnp.int32),
    )
    return {k: v[0] for k, v in out.items()}
