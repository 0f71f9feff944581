"""Test-time augmentation.

Reference: detectron2/modeling/test_time_augmentation.py:27
(``DatasetMapperTTA`` — multi-scale + flip), :85 (``GeneralizedRCNNWithTTA``
— merge boxes across augs -> NMS -> re-run masks on merged boxes), and the
WSL variants projects/WSL/wsl/modeling/test_time_augmentation_avg.py
(score/mask AVERAGING across scales/flips — valid because WSOD proposals are
fixed) and _union.py (UNION of detections).

Host-orchestrated: each augmented view runs the jitted model; merging is
numpy (cheap, per image).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

from ..data.detection_utils import pick_bucket
from ..ops.nms import batched_nms
from ..structures.boxes import clip_boxes


class TTAWrapperBase:
    def __init__(
        self,
        predict_fn: Callable[[Dict[str, np.ndarray]], Dict[str, np.ndarray]],
        min_sizes: Sequence[int] = (400, 500, 600, 700, 800),
        max_size: int = 1333,
        flip: bool = True,
        buckets: Sequence[Tuple[int, int]] = ((800, 1344), (1344, 800), (1024, 1024)),
    ):
        self.predict_fn = predict_fn
        self.min_sizes = list(min_sizes)
        self.max_size = max_size
        self.flip = flip
        self.buckets = [tuple(b) for b in buckets]

    def _augmented_batches(self, image: np.ndarray, orig_size):
        """Yield (batch, scale_x, scale_y, flipped) per augmentation."""
        from ..data.transforms import ResizeShortestEdge

        h0, w0 = image.shape[:2]
        for ms in self.min_sizes:
            nh, nw = ResizeShortestEdge.get_output_shape(h0, w0, ms, self.max_size)
            tfm = ResizeShortestEdge([ms, ms], self.max_size).get_transform(image)
            img = tfm.apply_image(image)
            variants = [(img, False)]
            if self.flip:
                variants.append((img[:, ::-1], True))
            for im, flipped in variants:
                hh, ww = im.shape[:2]
                bh, bw = pick_bucket(hh, ww, self.buckets)
                canvas = np.zeros((1, bh, bw, 3), np.float32)
                canvas[0, :hh, :ww] = im
                batch = {
                    "image": canvas,
                    "image_sizes": np.asarray([[hh, ww]], np.int32),
                    "orig_sizes": np.asarray([orig_size], np.int32),
                }
                yield batch, flipped


class GeneralizedRCNNWithTTA(TTAWrapperBase):
    """Union of detections across augs -> NMS -> topk -> re-run the mask
    head on the merged boxes in EVERY augmented view and average the
    probabilities (reference test_time_augmentation.py:85
    ``_inference_one_image`` / ``_reduce_pred_masks``; identical flow in the
    WSL UNION variant test_time_augmentation_union.py:190-291).

    The mask re-run requires the model to accept ``detected_boxes`` /
    ``detected_classes`` inputs (GeneralizedRCNN's given-boxes inference
    branch); models without it keep each detection's mask from its source
    augmentation."""

    rerun_masks: bool = True

    def _convert_flipped_outputs(self, outputs):
        """Hook for subclasses that must un-flip extra per-detection maps
        (e.g. DensePose chart outputs — part labels swap left/right)."""
        return outputs

    def __call__(self, image: np.ndarray, topk: int = 100, nms_thresh: float = 0.5):
        h0, w0 = image.shape[:2]
        all_boxes, all_scores, all_classes = [], [], []
        extra_keys = None
        all_extras: Dict[str, list] = {}
        for batch, flipped in self._augmented_batches(image, (h0, w0)):
            out = {k: np.asarray(v) for k, v in self.predict_fn(batch).items()}
            if flipped:
                out = self._convert_flipped_outputs(out)
            valid = out["valid"][0]
            boxes = out["boxes"][0][valid]
            if flipped:
                x0 = w0 - boxes[:, 2]
                x1 = w0 - boxes[:, 0]
                boxes = np.stack([x0, boxes[:, 1], x1, boxes[:, 3]], axis=1)
            all_boxes.append(boxes)
            all_scores.append(out["scores"][0][valid])
            all_classes.append(out["classes"][0][valid])
            # carry per-detection extra maps (dp_*, masks) through the merge
            if extra_keys is None:
                extra_keys = [
                    k for k in out if k.startswith("dp_") or k == "masks"
                ]
            for k in extra_keys:
                all_extras.setdefault(k, []).append(out[k][0][valid])
        if not all_boxes or sum(len(b) for b in all_boxes) == 0:
            return {
                "boxes": np.zeros((0, 4), np.float32),
                "scores": np.zeros((0,), np.float32),
                "classes": np.zeros((0,), np.int64),
            }
        boxes = np.concatenate(all_boxes)
        scores = np.concatenate(all_scores)
        classes = np.concatenate(all_classes)
        import jax.numpy as jnp

        keep_idx = np.asarray(
            batched_nms(
                jnp.asarray(boxes),
                jnp.asarray(scores),
                jnp.asarray(classes),
                nms_thresh,
                max_out=topk,
            )
        )
        keep_idx = keep_idx[keep_idx >= 0]
        result = {
            "boxes": boxes[keep_idx],
            "scores": scores[keep_idx],
            "classes": classes[keep_idx],
        }
        for k, vals in all_extras.items():
            result[k] = np.concatenate(vals)[keep_idx]
        if self.rerun_masks and "masks" in result and len(result["boxes"]):
            rerun = self._rerun_masks_on_merged(image, (h0, w0), result, topk)
            if rerun is not None:
                result["masks"] = rerun
        return result

    def _rerun_masks_on_merged(self, image, orig_size, result, topk):
        """Reference ``_rescale_detected_boxes`` + ``_reduce_pred_masks``:
        project the merged boxes into every augmented view, run the mask head
        there (given-boxes inference), un-flip, and average probabilities."""
        h0, w0 = orig_size
        n = len(result["boxes"])
        d = topk  # static capacity: one compiled shape across images
        boxes = np.zeros((d, 4), np.float32)
        boxes[:n] = result["boxes"]
        classes = np.zeros((d,), np.int32)
        classes[:n] = result["classes"]
        valid = np.zeros((d,), bool)
        valid[:n] = True

        acc = None
        count = 0
        for batch, flipped in self._augmented_batches(image, (h0, w0)):
            hh, ww = (int(v) for v in batch["image_sizes"][0])
            sx, sy = ww / w0, hh / h0
            bx = boxes * np.asarray([sx, sy, sx, sy], np.float32)
            if flipped:
                x0 = ww - bx[:, 2]
                x1 = ww - bx[:, 0]
                bx = np.stack([x0, bx[:, 1], x1, bx[:, 3]], axis=1)
            aug_batch = dict(
                batch,
                detected_boxes=bx[None],
                detected_classes=classes[None],
                detected_valid=valid[None],
            )
            try:
                out = self.predict_fn(aug_batch)
            except (KeyError, TypeError) as e:
                # model has no given-boxes branch: keep source-aug masks
                import logging

                logging.getLogger(__name__).warning(
                    "TTA mask re-run unavailable (%s); keeping per-view masks", e
                )
                return None
            if "masks" not in out:
                return None
            m = np.asarray(out["masks"])[0]  # (D, S, S) probabilities
            if flipped:
                m = m[:, :, ::-1]
            acc = m if acc is None else acc + m
            count += 1
        if acc is None:
            return None
        return (acc / count)[:n]


class GeneralizedRCNNWithTTAAVG(TTAWrapperBase):
    """WSOD TTA: proposals are FIXED, so per-proposal scores (and sem-seg
    maps) can be AVERAGED across scales/flips
    (reference test_time_augmentation_avg.py:383-441). The predict function
    must return raw per-proposal scores under 'proposal_class_scores'."""

    def __call__(
        self,
        image: np.ndarray,
        proposals: np.ndarray,  # (R, 4) in original image coords
        proposal_scores: np.ndarray,
        predict_scores_fn: Callable,
        score_thresh: float = 1e-5,
        nms_thresh: float = 0.3,
        topk: int = 100,
        superpixels: np.ndarray = None,  # (H0, W0) int32, original res
        oh_labels: np.ndarray = None,  # (R, S) membership (geometry-free)
        rerun_masks: bool = True,
    ):
        h0, w0 = image.shape[:2]
        acc = None
        n = 0
        sem_acc = None
        saw_masks = False
        for batch, flipped in self._augmented_batches(image, (h0, w0)):
            hh, ww = int(batch["image_sizes"][0][0]), int(batch["image_sizes"][0][1])
            sx, sy = ww / w0, hh / h0
            p = proposals * np.asarray([sx, sy, sx, sy], np.float32)
            if flipped:
                x0 = ww - p[:, 2]
                x1 = ww - p[:, 0]
                p = np.stack([x0, p[:, 1], x1, p[:, 3]], axis=1)
            batch["proposals"] = p[None]
            batch["proposal_scores"] = proposal_scores[None]
            if superpixels is not None:
                # the superpixel label map follows the image geometry
                # (reference wsl DatasetMapperTTAAVG re-transforms it per
                # augmentation): nearest resize + flip, padded to the bucket
                from PIL import Image as _Image

                sp = np.asarray(
                    _Image.fromarray(superpixels.astype(np.int32), mode="I").resize(
                        (ww, hh), _Image.NEAREST
                    ),
                    np.int32,
                )
                if flipped:
                    sp = sp[:, ::-1]
                bh, bw = batch["image"].shape[1:3]
                sp_pad = np.zeros((1, bh, bw), np.int32)
                sp_pad[0, :hh, :ww] = sp
                batch["superpixels"] = sp_pad
            if oh_labels is not None:
                batch["oh_labels"] = oh_labels[None]
            out = predict_scores_fn(batch)
            saw_masks = saw_masks or "masks" in out or "masks_full" in out
            scores = np.asarray(out["proposal_class_scores"])[0]
            acc = scores if acc is None else acc + scores
            if "sem_seg_logits" in out:
                sem = np.asarray(out["sem_seg_logits"])[0][:hh, :ww]
                if flipped:
                    sem = sem[:, ::-1]
                # resize to original
                from PIL import Image

                sem_r = np.stack(
                    [
                        np.asarray(
                            Image.fromarray(sem[..., c]).resize((w0, h0), Image.BILINEAR)
                        )
                        for c in range(sem.shape[-1])
                    ],
                    axis=-1,
                )
                sem_acc = sem_r if sem_acc is None else sem_acc + sem_r
            n += 1
        result = {"proposal_class_scores": acc / max(n, 1)}
        if sem_acc is not None:
            result["sem_seg_logits"] = sem_acc / max(n, 1)

        # Final merge (reference test_time_augmentation_avg.py:392-404):
        # averaged (R, C) scores on the FIXED original-coordinate proposals
        # -> one fast_rcnn-style per-class NMS.
        import jax.numpy as jnp

        from ..wsl.modeling.roi_heads_wsl import wsl_inference_single

        w = proposals[:, 2] - proposals[:, 0]
        ht = proposals[:, 3] - proposals[:, 1]
        valid = (w > 0) & (ht > 0)
        det = wsl_inference_single(
            jnp.asarray(proposals),
            jnp.asarray(result["proposal_class_scores"]),
            jnp.asarray(valid),
            jnp.asarray([h0, w0], jnp.float32),
            score_thresh,
            nms_thresh,
            topk,
        )
        dv = np.asarray(det["valid"])
        result["detections"] = {
            "boxes": np.asarray(det["boxes"])[dv],
            "scores": np.asarray(det["scores"])[dv],
            "classes": np.asarray(det["classes"])[dv],
        }

        if rerun_masks and saw_masks:
            # re-run the mask branch on the merged boxes in every augmented
            # view and average the probabilities, flip-corrected (reference
            # test_time_augmentation_avg.py:405-428 _rescale_detected_boxes
            # + _reduce_pred_masks)
            det_boxes = np.asarray(det["boxes"], np.float32)
            masks_acc, m_n = None, 0
            for batch, flipped in self._augmented_batches(image, (h0, w0)):
                hh, ww = int(batch["image_sizes"][0][0]), int(batch["image_sizes"][0][1])
                sx, sy = ww / w0, hh / h0
                p = det_boxes * np.asarray([sx, sy, sx, sy], np.float32)
                if flipped:
                    x0 = ww - p[:, 2]
                    x1 = ww - p[:, 0]
                    p = np.stack([x0, p[:, 1], x1, p[:, 3]], axis=1)
                batch["detected_boxes"] = p[None]
                batch["detected_classes"] = np.asarray(det["classes"])[None]
                batch["detected_valid"] = dv[None]
                try:
                    out = predict_scores_fn(batch)
                except (KeyError, TypeError) as e:
                    # model has no given-boxes branch (e.g. WSJDS emits
                    # masks_full from the seg head): degrade gracefully like
                    # the base TTA's mask re-run
                    import logging

                    logging.getLogger(__name__).warning(
                        "TTA-AVG mask re-run unavailable (%s); keeping merged boxes without masks", e
                    )
                    masks_acc = None
                    break
                if "masks" not in out:
                    masks_acc = None
                    break
                m = np.asarray(out["masks"])[0]  # (D, S, S) probabilities
                if flipped:
                    m = m[..., ::-1]
                masks_acc = m if masks_acc is None else masks_acc + m
                m_n += 1
            if masks_acc is not None and m_n:
                result["detections"]["masks"] = (masks_acc / m_n)[dv]
        return result


# the WSL UNION TTA (test_time_augmentation_union.py) is flow-identical to
# the base detectron2 TTA: union boxes -> NMS -> mask re-run on merged boxes
GeneralizedRCNNWithTTAUNION = GeneralizedRCNNWithTTA


class DatasetMapperTTA:
    """Standalone augmented-view mapper (reference test_time_augmentation.py:27
    ``DatasetMapperTTA``): maps one dataset dict to the list of multi-scale /
    flip variants the TTA wrappers consume. The wrappers above inline the same
    augmentation enumeration; this class is the reference-shaped public entry
    for users composing their own TTA loop."""

    def __init__(self, cfg=None, *, min_sizes=None, max_size=None, flip=None):
        if cfg is not None:
            min_sizes = list(cfg.TEST.AUG.MIN_SIZES) if min_sizes is None else min_sizes
            max_size = cfg.TEST.AUG.MAX_SIZE if max_size is None else max_size
            flip = cfg.TEST.AUG.FLIP if flip is None else flip
        self.min_sizes = list(min_sizes if min_sizes is not None else (400, 500, 600, 700, 800))
        self.max_size = max_size if max_size is not None else 1333
        self.flip = True if flip is None else bool(flip)

    def __call__(self, dataset_dict: Dict) -> List[Dict]:
        from ..data.transforms import ResizeShortestEdge

        image = np.asarray(dataset_dict["image"])
        h0, w0 = image.shape[:2]
        out = []
        for ms in self.min_sizes:
            tfm = ResizeShortestEdge([ms, ms], self.max_size).get_transform(image)
            img = tfm.apply_image(image)
            variants = [(img, False)]
            if self.flip:
                variants.append((img[:, ::-1], True))
            for im, flipped in variants:
                d = dict(dataset_dict)
                d["image"] = im
                d["flipped"] = flipped
                d["scale_x"] = im.shape[1] / w0
                d["scale_y"] = im.shape[0] / h0
                out.append(d)
        return out


class DatasetMapperTTAAVG(DatasetMapperTTA):
    """WSOD TTA view mapper (reference wsl/test_time_augmentation_avg.py:126
    ``DatasetMapperTTAAVG``): like :class:`DatasetMapperTTA` but re-transforms
    the FIXED precomputed ``proposals`` (original-image coords) and the
    ``superpixels`` label map into every augmented view's geometry, the way
    the AVG/UNION wrappers do internally."""

    def __call__(self, dataset_dict: Dict) -> List[Dict]:
        views = super().__call__(dataset_dict)
        proposals = dataset_dict.get("proposals")
        superpixels = dataset_dict.get("superpixels")
        for d in views:
            hh, ww = d["image"].shape[:2]
            if proposals is not None:
                p = np.asarray(proposals, np.float32) * np.asarray(
                    [d["scale_x"], d["scale_y"], d["scale_x"], d["scale_y"]],
                    np.float32,
                )
                if d["flipped"]:
                    p = np.stack([ww - p[:, 2], p[:, 1], ww - p[:, 0], p[:, 3]], axis=1)
                d["proposals"] = p
            if superpixels is not None:
                from PIL import Image as _Image

                sp = np.asarray(
                    _Image.fromarray(
                        np.asarray(superpixels, np.int32), mode="I"
                    ).resize((ww, hh), _Image.NEAREST),
                    np.int32,
                )
                d["superpixels"] = sp[:, ::-1] if d["flipped"] else sp
        return views


# the reference UNION mapper transforms views identically (union happens in
# the wrapper, not the mapper)
DatasetMapperTTAUNION = DatasetMapperTTAAVG
