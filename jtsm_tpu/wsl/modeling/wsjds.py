"""WSJDS: weakly-supervised joint detection and segmentation ROI heads.

Reference: projects/WSL/wsl/modeling/seg_heads/wsjds_heads.py:36
(``WSJDSROIHeads``): a MIL box branch whose image-level loss is modulated by
CSC (contrastive spatial confidence) weights computed from CPG (class peak
gradient) maps (:543 ``_forward_cpg``, :596 ``_forward_csc``), plus pseudo
semantic-segmentation targets thresholded from the same CPG maps
(:670 ``_get_sem_seg_target``) that supervise the stuff branch.

TPU re-design: the reference computes CPG inline with
``torch.autograd.grad`` against the live graph; in JAX the grad-of-forward
is a separate transform, so the trainer mines CPG maps with
``wsod_zoo.compute_cpg`` (jax.grad of the image-level score closure) and
passes them through ``targets['cpg']`` (B, C, H, W). Everything in this
module is then static-shape vectorized: CSC weights via the box-mass
formulation in ``wsod_zoo.csc`` and per-class binary sem-seg targets with
balanced fg/bg weights.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import ShapeSpec
from ...modeling.poolers import ROIPooler
from ...modeling.roi_heads.roi_heads import ROI_HEADS_REGISTRY
from .mil_heads import MILOutputLayers, mil_image_loss, wsddn_scores
from .roi_heads_wsl import (
    DiscriminativeAdaptionNeck,
    OICRROIHeads,
    WSDDNROIHeads,
    image_level_gt,
    wsl_inference_single,
)
from .wsod_zoo import csc

Array = jax.Array


def sem_seg_targets_from_cpg(
    cpg: Array,  # (C, H, W) normalized class peak gradient maps, one image
    img_labels: Array,  # (C,) multi-hot image labels
    fg_threshold: float = 0.7,
    bg_threshold: float = 0.1,
) -> Tuple[Array, Array]:
    """Per-class binary targets + balanced weights
    (reference wsjds_heads.py:670 ``_get_sem_seg_target``): cpg >= fg ->
    positive, < bg -> negative, in between -> ignore (weight 0); absent
    classes are all-negative. fg/bg weights are normalized by their pixel
    counts so each side contributes equally."""
    present = img_labels[:, None, None] > 0.5
    pos = (cpg >= fg_threshold) & present
    neg = (cpg < bg_threshold) | ~present
    targets = pos.astype(jnp.float32)
    n_pos = jnp.maximum(pos.sum(axis=(1, 2), keepdims=True), 1.0)
    n_neg = jnp.maximum(neg.sum(axis=(1, 2), keepdims=True), 1.0)
    weights = jnp.where(pos, 1.0 / n_pos, jnp.where(neg, 1.0 / n_neg, 0.0))
    return targets, weights


def csc_weighted_mil_image_loss(
    mil_i,  # (R, C) WSDDN probabilities, one image
    boxes_i,  # (R, 4)
    valid_i,  # (R,)
    labels_i,  # (C,) image-level one-hot
    cpg_i,  # (C, H, W) class peak gradient maps
    num_classes: int,
    csc_fg_threshold: float = 0.1,
):
    """CSC weighting (reference roi_heads_csc.py / wsjds_heads.py:596): per
    present class, proposals whose boxes capture the CPG mass keep their
    positive contribution; leaky proposals are pushed toward 0."""

    def one_class(c):
        w = csc(cpg_i[c], boxes_i, valid_i, fg_thresh=csc_fg_threshold)
        pos_w = w["pos_weight"]
        neg_w = w["neg_weight"]
        s_pos = jnp.sum(mil_i[:, c] * pos_w) / jnp.maximum(jnp.sum(pos_w), 1e-6)
        s_neg = jnp.sum(mil_i[:, c] * neg_w) / jnp.maximum(jnp.sum(neg_w), 1e-6)
        return s_pos, s_neg

    s_pos, s_neg = jax.vmap(one_class)(jnp.arange(num_classes))
    sum_scores = jnp.clip(mil_i.sum(0), 1e-6, 1 - 1e-6)
    s_pos = jnp.clip(s_pos, 1e-6, 1 - 1e-6)
    s_neg = jnp.clip(s_neg, 1e-6, 1 - 1e-6)
    # present classes: confident (pos-weighted) mass -> label 1,
    # leaked (neg-weighted) mass -> label 0; absent: sum -> 0
    loss_pos = -(labels_i * jnp.log(s_pos)).sum() / jnp.maximum(labels_i.sum(), 1.0)
    loss_neg = -(labels_i * jnp.log1p(-s_neg)).sum() / jnp.maximum(
        labels_i.sum(), 1.0
    )
    loss_abs = -((1 - labels_i) * jnp.log1p(-sum_scores)).sum() / jnp.maximum(
        (1 - labels_i).sum(), 1.0
    )
    return loss_pos + loss_neg + loss_abs


@ROI_HEADS_REGISTRY.register()
class WSJDSROIHeads(WSDDNROIHeads):
    """MIL box branch with CSC-weighted image loss + CPG sem-seg mining
    (reference wsjds_heads.py:36). Box features are scaled by
    (objectness + 1) before the neck (reference :386)."""

    csc_fg_threshold: float = 0.1
    sem_fg_threshold: float = 0.7
    sem_bg_threshold: float = 0.1

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        ret = WSDDNROIHeads.from_config(cfg, input_shape)
        ret.update(
            csc_fg_threshold=cfg.WSL.CSC_FG_THRESHOLD,
            sem_fg_threshold=cfg.WSL.SEM_FG_THRESHOLD,
            sem_bg_threshold=cfg.WSL.SEM_BG_THRESHOLD,
        )
        return ret

    @nn.compact
    def __call__(
        self,
        features: Dict[str, Array],
        proposals: Array,  # (B, R, 4)
        proposal_scores: Array,  # (B, R) -inf padding
        image_sizes: Array,
        targets: Optional[Dict[str, Array]] = None,
        train: bool = False,
        superpixels=None,
        oh_labels=None,
    ):
        feats = [features[f] for f in self.in_features]
        b, r = proposals.shape[:2]
        flat_boxes = proposals.reshape(b * r, 4)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
        pooled = self.pooler(feats, flat_boxes, batch_idx, rois_per_image=r)
        # objectness + 1 feature scaling (reference wsjds_heads.py:386)
        obj = jnp.where(jnp.isfinite(proposal_scores), proposal_scores, 0.0)
        scale = (obj + 1.0).reshape(b * r, 1, 1, 1)
        pooled = pooled * scale.astype(pooled.dtype)

        x = DiscriminativeAdaptionNeck(dims=self.dan_dims, dtype=self.dtype, name="dan")(
            pooled, train=train
        )
        cls_logit, det_logit = MILOutputLayers(
            num_classes=self.num_classes, dtype=self.dtype, name="mil"
        )(x)
        cls_logit = cls_logit.reshape(b, r, -1)
        det_logit = det_logit.reshape(b, r, -1)
        valid = jnp.isfinite(proposal_scores)
        mil = jax.vmap(wsddn_scores)(cls_logit, det_logit, valid)  # (B, R, C)

        if train:
            img_labels = jax.vmap(
                lambda c, v: image_level_gt(c, v, self.num_classes)
            )(targets["gt_classes"], targets["gt_valid"])

            cpg = targets.get("cpg")  # (B, C, H, W) or None
            if cpg is None:
                loss = jax.vmap(mil_image_loss)(mil, img_labels).mean()
                return {}, {"loss_mil": loss}

            loss_csc = jax.vmap(
                lambda m, bx, v, l, c: csc_weighted_mil_image_loss(
                    m, bx, v, l, c, self.num_classes, self.csc_fg_threshold
                )
            )(mil, proposals, valid, img_labels, cpg).mean()

            sem_t, sem_w = jax.vmap(
                lambda c, l: sem_seg_targets_from_cpg(
                    c, l, self.sem_fg_threshold, self.sem_bg_threshold
                )
            )(cpg, img_labels)
            aux = {"pgt_sem_seg_binary": sem_t, "pgt_sem_seg_weights": sem_w}
            return aux, {"loss_mil_csc": loss_csc}

        detections = jax.vmap(
            lambda bx, sc, v, sz: wsl_inference_single(
                bx,
                sc,
                v,
                sz,
                self.score_thresh_test,
                self.nms_thresh_test,
                self.detections_per_image,
            )
        )(proposals, mil, valid, image_sizes)
        detections["proposal_class_scores"] = mil
        return detections, {}


@ROI_HEADS_REGISTRY.register()
class CSCROIHeads(WSJDSROIHeads):
    """CSC: CPG-weighted WSDDN (reference roi_heads_csc.py:35
    ``CSCROIHeads``). Same machinery as WSJDS minus the stuff branch — the
    sem-seg pseudo targets it mines are simply unused when the meta-arch has
    no seg head."""


@ROI_HEADS_REGISTRY.register()
class CSCOICRROIHeads(OICRROIHeads):
    """CSC + OICR refinement (reference roi_heads_csc.py ``CSC_OICR`` /
    config name ``CSCOICRROIHeads``): the base MIL image loss is CSC-weighted
    from CPG maps in targets['cpg']; the K refinement branches are standard
    OICR."""

    csc_fg_threshold: float = 0.1

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        ret = OICRROIHeads.from_config(cfg, input_shape)
        ret["csc_fg_threshold"] = cfg.WSL.CSC_FG_THRESHOLD
        return ret

    def _mil_losses(self, mil, img_labels, proposals, valid, targets):
        cpg = targets.get("cpg") if targets is not None else None
        if cpg is None:
            return super()._mil_losses(mil, img_labels, proposals, valid, targets)
        loss = jax.vmap(
            lambda m, bx, v, l, c: csc_weighted_mil_image_loss(
                m, bx, v, l, c, self.num_classes, self.csc_fg_threshold
            )
        )(mil, proposals, valid, img_labels, cpg).mean()
        return {"loss_mil_csc": loss}
