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
from ...layers.wrappers import interpolate_bilinear
from ...modeling.meta_arch.semantic_seg import build_sem_seg_head
from ...modeling.roi_heads.roi_heads import ROI_HEADS_REGISTRY
from .mil_heads import MILOutputLayers, mil_image_loss, wsddn_scores
from .roi_heads_wsl import (
    DiscriminativeAdaptionNeck,
    OICRROIHeads,
    WSDDNROIHeads,
    image_level_gt,
    wsl_inference_single,
)
from .wsod_zoo import csc_full

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
    classes are all-negative; present classes with an all-zero map (the CPG
    transform zeroes maps whose image prediction is below tau — reference
    ``pred_class_img_logits < tau -> 255``) are fully ignored. fg/bg weights
    are normalized by their pixel counts so each side contributes equally."""
    present = img_labels[:, None, None] > 0.5
    has_map = cpg.max(axis=(1, 2), keepdims=True) > 0
    pos = (cpg >= fg_threshold) & present & has_map
    neg = ((cpg < bg_threshold) & present & has_map) | ~present
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
    cpg_i,  # (C, H, W) class peak gradient maps, each normalized to max 1
    num_classes: int,
    csc_fg_threshold: float = 0.1,
    mean_loss: bool = True,
):
    """Reference-exact CSC image loss (fast_rcnn_tsm.py:1051 ``csc_loss`` +
    roi_heads_csc.py:496 ``_forward_csc``): the CSC op yields per-(roi,class)
    weights W in [-1, 1]; W_pos = max(W, 0) keeps confident proposals'
    positive contribution (BCE of the W_pos-weighted image score against the
    label — absent classes have W == 1, so this term also suppresses them),
    W_neg = |min(W, 0)| collects leaky proposals, pushed to 0 (BCE against
    NL == 0). Returns (loss_cls_pos, loss_cls_neg)."""
    preds_img = mil_i.sum(0)  # pred_class_img_logits (roi_heads_csc.py:520)
    w = csc_full(
        cpg_i,
        boxes_i,
        valid_i,
        labels_i,
        preds_img,
        fg_threshold=csc_fg_threshold,
    )  # (R, C)
    w_pos = jnp.maximum(w, 0.0)
    w_neg = jnp.abs(jnp.minimum(w, 0.0))
    img_pos = jnp.clip((mil_i * w_pos).sum(0), 1e-20, 1.0 - 1e-20)
    img_neg = jnp.clip((mil_i * w_neg).sum(0), 1e-20, 1.0 - 1e-20)

    def bce(p, t):
        return -(t * jnp.log(p) + (1.0 - t) * jnp.log1p(-p))

    reduce = jnp.mean if mean_loss else jnp.sum
    return reduce(bce(img_pos, labels_i)), reduce(
        bce(img_neg, jnp.zeros_like(img_neg))
    )


@ROI_HEADS_REGISTRY.register()
class WSJDSROIHeads(WSDDNROIHeads):
    """MIL box branch with CSC-weighted image loss + CPG sem-seg mining
    (reference wsjds_heads.py:36). Box features are scaled by
    (objectness + 1) before the neck (reference :386). The head owns its
    own seg branch (reference ``_init_sem_seg_head`` :218 — an ASPP head
    supervised with the CPG-mined binary targets :414-422); its sigmoid
    predictions feed BACK into a second, 0.1-weighted CSC det loss
    (:430-448) and provide full-image instance masks at inference
    (``_get_ins_seg_result`` :697)."""

    csc_fg_threshold: float = 0.1
    sem_fg_threshold: float = 0.7
    sem_bg_threshold: float = 0.1
    sem_seg_head: Optional[nn.Module] = None
    # stride of the seg-branch input feature: padded image resolution is
    # feature_hw * stride (static shapes; images pad to divisibility)
    seg_stride: int = 8

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        ret = WSDDNROIHeads.from_config(cfg, input_shape)
        ret.update(
            csc_fg_threshold=cfg.WSL.CSC_FG_THRESHOLD,
            sem_fg_threshold=cfg.WSL.SEM_FG_THRESHOLD,
            sem_bg_threshold=cfg.WSL.SEM_BG_THRESHOLD,
        )
        # the seg branch needs a head that supports binary det->seg
        # supervision (ASPPHead); the plain CSC heads run without one
        if cfg.MODEL.SEM_SEG_HEAD.NAME == "ASPPHead":
            ret["sem_seg_head"] = build_sem_seg_head(cfg, input_shape)
            feat = cfg.MODEL.ROI_HEADS.IN_FEATURES[-1]
            ret["seg_stride"] = input_shape[feat].stride
        return ret

    def _seg_branch_train(self, features, losses, mil, proposals, valid, img_labels, cpg):
        """det -> seg -> det round trip (reference wsjds_heads.py:414-448).
        Returns the merged loss dict."""
        sem_t, sem_w = jax.vmap(
            lambda c, l: sem_seg_targets_from_cpg(
                c, l, self.sem_fg_threshold, self.sem_bg_threshold
            )
        )(cpg, img_labels)
        if self.sem_seg_head is None:
            # no seg branch: expose the mined targets for an external head
            return losses, {"pgt_sem_seg_binary": sem_t, "pgt_sem_seg_weights": sem_w}
        logits, sem_losses = self.sem_seg_head(
            features, None, train=True, binary_targets=sem_t, binary_weights=sem_w
        )
        losses.update(sem_losses)
        # seg -> det: sigmoid masks, per-class max-normalized, re-run CSC
        # as 0.1-weighted ``mask_``-prefixed losses (reference :430-448)
        masks = jax.nn.sigmoid(logits.astype(jnp.float32))  # (B, h, w, C)
        masks = jnp.transpose(masks, (0, 3, 1, 2))  # (B, C, h, w)
        masks = interpolate_bilinear(
            jnp.transpose(masks, (0, 2, 3, 1)), cpg.shape[-2:]
        )
        masks = jnp.transpose(masks, (0, 3, 1, 2))
        masks = masks / jnp.maximum(masks.max(axis=(2, 3), keepdims=True), 1e-12)
        m_pos, m_neg = jax.vmap(
            lambda m, bx, v, l, c: csc_weighted_mil_image_loss(
                m, bx, v, l, c, self.num_classes, self.csc_fg_threshold, self.mean_loss
            )
        )(mil, proposals, valid, img_labels, masks)
        losses["loss_mask_cls_pos"] = 0.1 * m_pos.mean()
        losses["loss_mask_cls_neg"] = 0.1 * m_neg.mean()
        return losses, {"pgt_sem_seg_binary": sem_t, "pgt_sem_seg_weights": sem_w}

    def _seg_branch_inference(self, features, detections, image_hw):
        """Full-image instance masks windowed from the seg prediction at
        each detection's box + no_paste flags (reference
        ``_get_ins_seg_result`` wsjds_heads.py:697)."""
        if self.sem_seg_head is None:
            return detections
        logits, _ = self.sem_seg_head(features, None, train=False)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        probs = interpolate_bilinear(probs, image_hw)  # (B, H, W, C)
        h, w = image_hw
        yy = jnp.arange(h, dtype=jnp.float32)[:, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, :]

        def one_image(p, boxes, classes):
            cls_maps = jnp.transpose(p, (2, 0, 1))[
                jnp.clip(classes, 0, self.num_classes - 1)
            ]  # (D, H, W)
            x0, y0, x1, y1 = jnp.split(boxes, 4, axis=1)  # (D, 1) each
            window = (
                (yy[None] >= y0[..., None])
                & (yy[None] < y1[..., None])
                & (xx[None] >= x0[..., None])
                & (xx[None] < x1[..., None])
            )
            return cls_maps * window

        detections["masks_full"] = jax.vmap(one_image)(
            probs, detections["boxes"], detections["classes"]
        )
        detections["no_paste"] = detections["valid"]
        return detections

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
                loss = jax.vmap(
                    lambda m, l: mil_image_loss(m, l, self.mean_loss)
                )(mil, img_labels).mean()
                return {}, {"loss_mil": loss}

            loss_pos, loss_neg = jax.vmap(
                lambda m, bx, v, l, c: csc_weighted_mil_image_loss(
                    m, bx, v, l, c, self.num_classes, self.csc_fg_threshold, self.mean_loss
                )
            )(mil, proposals, valid, img_labels, cpg)

            losses = {
                "loss_cls_pos": loss_pos.mean(),
                "loss_cls_neg": loss_neg.mean(),
            }
            losses, aux = self._seg_branch_train(
                features, losses, mil, proposals, valid, img_labels, cpg
            )
            return aux, losses

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
        detections = self._seg_branch_inference(
            features,
            detections,
            (feats[-1].shape[1] * self.seg_stride, feats[-1].shape[2] * self.seg_stride),
        )
        return detections, {}


@ROI_HEADS_REGISTRY.register()
class CSCROIHeads(WSJDSROIHeads):
    """CSC: CPG-weighted WSDDN (reference roi_heads_csc.py:35
    ``CSCROIHeads``). Same machinery as WSJDS minus the stuff branch."""

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        ret = WSJDSROIHeads.from_config(cfg, input_shape)
        ret["sem_seg_head"] = None  # detection-only (reference roi_heads_csc.py)
        return ret


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
        loss_pos, loss_neg = jax.vmap(
            lambda m, bx, v, l, c: csc_weighted_mil_image_loss(
                m, bx, v, l, c, self.num_classes, self.csc_fg_threshold, self.mean_loss
            )
        )(mil, proposals, valid, img_labels, cpg)
        return {
            "loss_cls_pos": loss_pos.mean(),
            "loss_cls_neg": loss_neg.mean(),
        }


# ---------------------------------------------------------------------------
# CPG injection for the training loop (reference roi_heads_csc.py:443
# ``_forward_cpg`` runs torch.autograd.grad inside the head each step; here
# the maps are produced by a jitted grad pass BEFORE the train step and ride
# into the head through ``batch['cpg']`` — same two-pass dataflow, expressed
# as a SimpleTrainer.batch_transform)
# ---------------------------------------------------------------------------

# heads that consume CPG maps (reference GeneralizedRCNNWSL.has_cpg class set)
CPG_ROI_HEADS = ("CSCROIHeads", "CSCOICRROIHeads", "WSJDSROIHeads")

# reference constants (roi_heads_csc.py:111): maps of classes whose image
# prediction is below tau are zeroed; at most this many present classes per
# image get maps each step (static shape for jit; VOC images carry 1-3)
CPG_TAU = 0.7
CPG_MAX_CLASSES = 8


def make_cpg_batch_transform(model, csc_max_iter: int, num_classes: int):
    """Build a ``SimpleTrainer.batch_transform`` that adds per-class CPG
    maps (B, C, H, W) to each training batch until ``csc_max_iter`` (wiring
    WSL.CSC_MAX_ITER — after the cutoff the heads fall back to the plain MIL
    loss exactly like the reference's ``return None``)."""
    import numpy as np

    @jax.jit
    def cpg_maps(variables, batch, class_idx, class_ok):
        images = batch["image"]

        def image_scores(imgs):
            out = model.apply(variables, dict(batch, image=imgs), train=False)
            return out["proposal_class_scores"].sum(axis=1)  # (B, C)

        # reference tau gate: classes predicted below tau get no map
        preds = jnp.clip(image_scores(images), 0.0, 1.0)
        pred_ok = jnp.take_along_axis(preds, class_idx, axis=1) >= CPG_TAU
        ok = class_ok & pred_ok  # (B, K)

        def per_class(args):
            idx_k, ok_k = args  # (B,), (B,)

            def score(imgs):
                s = image_scores(imgs)
                picked = jnp.take_along_axis(s, idx_k[:, None], axis=1)[:, 0]
                return jnp.sum(picked * ok_k)

            g = jax.grad(score)(images)  # (B, H, W, 3)
            cpg = jnp.abs(g).max(-1)
            return cpg / jnp.maximum(cpg.max(axis=(1, 2), keepdims=True), 1e-20)

        # lax.map: K sequential grad passes (vmap would hold K backbones of
        # activations live; the reference also loops classes sequentially)
        cpgs = jax.lax.map(
            per_class, (class_idx.T, class_ok.T)
        )  # (K, B, H, W)
        cpgs = jnp.transpose(cpgs, (1, 0, 2, 3)) * ok[..., None, None]
        b, _, h, w = cpgs.shape
        full = jnp.zeros((b, num_classes, h, w), cpgs.dtype)
        # max-scatter: padded slots carry all-zero maps and cannot clobber
        return full.at[jnp.arange(b)[:, None], class_idx].max(cpgs)

    def transform(state, batch, iteration):
        if iteration > csc_max_iter or "gt_classes" not in batch:
            return batch
        gt_c = np.asarray(batch["gt_classes"])
        gt_v = np.asarray(batch["gt_valid"]).astype(bool)
        b = gt_c.shape[0]
        idx = np.zeros((b, CPG_MAX_CLASSES), np.int32)
        ok = np.zeros((b, CPG_MAX_CLASSES), bool)
        for i in range(b):
            present = np.unique(gt_c[i][gt_v[i]])[:CPG_MAX_CLASSES]
            idx[i, : len(present)] = present
            ok[i, : len(present)] = True
        variables = {"params": state.params}
        if jax.tree_util.tree_leaves(state.frozen):
            variables["frozen"] = state.frozen
        if jax.tree_util.tree_leaves(state.batch_stats):
            variables["batch_stats"] = state.batch_stats
        device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        cpg = cpg_maps(variables, device_batch, jnp.asarray(idx), jnp.asarray(ok))
        return dict(batch, cpg=cpg)

    return transform
