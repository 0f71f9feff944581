"""Convert batched static detection arrays <-> per-image Instances (user API
parity: the reference returns {"instances": Instances} per image)."""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..structures import Boxes, Instances


def batched_outputs_to_instances(
    outputs: Dict[str, np.ndarray],
    image_index: int,
    image_size,
    paste_masks: bool = False,
    mask_threshold: float = 0.5,
) -> Instances:
    """outputs: batched detection dict; image_index selects the image."""
    boxes = np.asarray(outputs["boxes"][image_index])
    scores = np.asarray(outputs["scores"][image_index])
    classes = np.asarray(outputs["classes"][image_index])
    valid = np.asarray(outputs.get("valid", np.ones(len(boxes), bool))[image_index])

    inst = Instances(tuple(int(x) for x in image_size))
    inst.pred_boxes = Boxes(boxes[valid])
    inst.scores = scores[valid]
    inst.pred_classes = classes[valid]
    if "masks" in outputs:
        masks = np.asarray(outputs["masks"][image_index])[valid]
        if paste_masks:
            from ..evaluation.coco_evaluation import _paste_mask_np

            h, w = inst.image_size
            full = np.stack(
                [
                    _paste_mask_np(m.astype(np.float32), b, h, w, mask_threshold)
                    for m, b in zip(masks, boxes[valid])
                ]
            ) if len(masks) else np.zeros((0,) + inst.image_size, bool)
            inst.pred_masks = full
        else:
            inst.pred_masks = masks
    if "keypoints" in outputs:
        inst.pred_keypoints = np.asarray(outputs["keypoints"][image_index])[valid]
    return inst


def split_batched_outputs(outputs: Dict[str, np.ndarray], image_sizes) -> List[Dict]:
    """The reference's list-of-dicts output format: one
    {"instances": Instances} per image."""
    b = np.asarray(outputs["scores"]).shape[0]
    return [
        {"instances": batched_outputs_to_instances(outputs, i, image_sizes[i])}
        for i in range(b)
    ]
