"""WSOD ROI heads: WSDDN, OICR, and the JTSM joint thing-stuff head.

Reference:
* roi_heads_wsddn.py — MIL-only head
* roi_heads_oicr.py — MIL + K OICR refinement branches (+ optional box reg)
* roi_heads_jtsm.py:198 — JTSMROIHeads: superpixel-aware MOIPool, joint
  thing+stuff MIL (TSM), refinement cascade on mined PGT, mask mining with
  superpixel-union object evidence, pseudo sem-seg painting (:2024)
* box_head.py:106 — DiscriminativeAdaptionNeck (DAN)

Static-shape conventions: proposals are (B, R, 4) with validity; image-level
labels are multi-hot vectors; every mining step returns fixed-capacity
arrays with weights/validity instead of dynamic lists.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import Linear, ShapeSpec
from ...modeling.poolers import ROIPooler
from ...modeling.roi_heads.roi_heads import ROI_HEADS_REGISTRY
from ...ops.box_regression import Box2BoxTransform
from ...ops.losses import smooth_l1_loss
from ...ops.nms import batched_nms_mask
from ...structures.boxes import clip_boxes, nonempty_boxes
from .mil_heads import (
    GAMLayer,
    MILOutputLayers,
    OICROutputLayers,
    gam_image_loss,
    get_pgt_mist,
    get_pgt_top_k,
    label_proposals_by_pgt,
    mil_image_loss,
    oicr_branch_loss,
    oicr_branch_loss_terms,
    oicr_reg_loss_sum,
    wsddn_scores,
)

Array = jax.Array


def image_level_gt(gt_classes: Array, gt_valid: Array, num_classes: int) -> Array:
    """(G,), (G,) -> (C,) multi-hot (reference roi_heads.py:146)."""
    oh = jax.nn.one_hot(jnp.clip(gt_classes, 0, num_classes - 1), num_classes)
    return jnp.clip((oh * gt_valid[:, None].astype(oh.dtype)).sum(0), 0, 1)


def image_level_gt_stuff(gt_sem_seg: Array, num_stuff: int, ignore_value: int = 255) -> Array:
    """Present stuff classes from the sem-seg map
    (reference roi_heads_jtsm.py:166). Presence only needs ANY, not a
    histogram: per-class vectorized compare+reduce replaces the scatter-add,
    which was latency-bound at ~12 cycles/pixel (14.5 ms of the JTSM step
    at 480x864 batch 4)."""
    valid = (gt_sem_seg != ignore_value) & (gt_sem_seg >= 0) & (gt_sem_seg < num_stuff)
    flat = jnp.where(valid, gt_sem_seg, -1).reshape(-1)
    present = jax.vmap(lambda c: jnp.any(flat == c))(jnp.arange(num_stuff))
    return present.astype(jnp.float32)


class DiscriminativeAdaptionNeck(nn.Module):
    """2 x 4096 FC 'DAN' (reference box_head.py:106). Also registered as a
    plain ROI_BOX_HEAD so the reference's faster_rcnn_WSR_* yamls (which set
    ROI_BOX_HEAD.NAME: DiscriminativeAdaptionNeck under StandardROIHeads)
    build verbatim."""

    dims: Sequence[int] = (4096, 4096)
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg, input_shape=None):
        import jax.numpy as _jnp

        return dict(
            dims=tuple(cfg.MODEL.ROI_BOX_HEAD.DAN_DIM),
            dtype=_jnp.bfloat16
            if cfg.TPU.COMPUTE_DTYPE == "bfloat16"
            else _jnp.float32,
        )

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        for i, d in enumerate(self.dims):
            x = Linear(
                features=d,
                dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.005),
                name=f"dan{i + 1}",
            )(x)
            x = nn.relu(x)
            if self.dropout > 0:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(
                    x, rng=self.make_rng("dropout") if train else None
                )
        return x


def wsl_inference_single(
    boxes: Array,  # (R, 4) proposals (or per-class regressed boxes (R, C, 4))
    scores: Array,  # (R, C) class probabilities (NOT logits)
    valid: Array,  # (R,)
    image_size: Array,
    score_thresh: float,
    nms_thresh: float,
    topk_per_image: int,
    nms_candidates: int = 1024,
) -> Dict[str, Array]:
    """Per-class threshold -> NMS -> topk on probability scores."""
    r, c = scores.shape
    if boxes.ndim == 2:
        boxes_pc = jnp.broadcast_to(boxes[:, None, :], (r, c, 4))
    else:
        boxes_pc = boxes
    boxes_pc = jax.vmap(lambda bb: clip_boxes(bb, image_size))(boxes_pc)
    flat_scores = scores.reshape(-1)
    flat_boxes = boxes_pc.reshape(-1, 4)
    flat_classes = jnp.tile(jnp.arange(c, dtype=jnp.int32), (r,))
    keepable = (
        (scores > score_thresh).reshape(-1)
        & jnp.repeat(valid, c)
        & nonempty_boxes(flat_boxes)
    )
    flat_scores = jnp.where(keepable, flat_scores, -jnp.inf)
    cc = min(nms_candidates, flat_scores.shape[0])
    cand_scores, cand_idx = jax.lax.top_k(flat_scores, cc)
    cand_boxes = flat_boxes[cand_idx]
    cand_classes = flat_classes[cand_idx]
    keep = batched_nms_mask(cand_boxes, cand_scores, cand_classes, nms_thresh)
    final = jnp.where(keep, cand_scores, -jnp.inf)
    k = min(topk_per_image, cc)
    top_scores, top_i = jax.lax.top_k(final, k)
    out_valid = jnp.isfinite(top_scores)
    out = {
        "boxes": cand_boxes[top_i],
        "scores": jnp.where(out_valid, top_scores, 0.0),
        "classes": cand_classes[top_i],
        "valid": out_valid,
        # source proposal of each detection (for superpixel/no_paste masks)
        "prop_idx": (cand_idx[top_i] // c).astype(jnp.int32),
    }
    if topk_per_image > k:
        pad = topk_per_image - k
        out = {
            "boxes": jnp.concatenate([out["boxes"], jnp.zeros((pad, 4))]),
            "scores": jnp.concatenate([out["scores"], jnp.zeros((pad,))]),
            "classes": jnp.concatenate([out["classes"], jnp.zeros((pad,), jnp.int32)]),
            "valid": jnp.concatenate([out["valid"], jnp.zeros((pad,), bool)]),
            "prop_idx": jnp.concatenate([out["prop_idx"], jnp.zeros((pad,), jnp.int32)]),
        }
    return out


@ROI_HEADS_REGISTRY.register()
class WSDDNROIHeads(nn.Module):
    """MIL-only weakly supervised head (reference roi_heads_wsddn.py)."""

    num_classes: int
    in_features: Sequence[str]
    pooler: ROIPooler
    dan_dims: Sequence[int] = (4096, 4096)
    score_thresh_test: float = 1e-4
    nms_thresh_test: float = 0.4
    detections_per_image: int = 100
    has_gam: bool = False
    mean_loss: bool = True
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        in_features = tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES)
        pooler = ROIPooler(
            output_size=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            scales=tuple(1.0 / input_shape[f].stride for f in in_features),
            sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
            pooler_type="ROIAlignV2",
        )
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        return dict(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            in_features=in_features,
            pooler=pooler,
            dan_dims=tuple(cfg.MODEL.ROI_BOX_HEAD.DAN_DIM),
            score_thresh_test=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            nms_thresh_test=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            has_gam=cfg.WSL.HAS_GAM,
            mean_loss=cfg.WSL.MEAN_LOSS,
            dtype=dtype,
        )

    def _apply_gam(self, feats):
        """WSL.HAS_GAM: guided-attention rescale of the (single-level)
        feature + image-level class logits (reference roi_heads_all.py:1733
        applies GAM before pooling)."""
        if not self.has_gam:
            return feats, None
        assert len(feats) == 1, "GAM requires a single feature level"
        attended, gam_logits = GAMLayer(
            num_classes=self.num_classes, dtype=self.dtype, name="gam"
        )(feats[0])
        return [attended], gam_logits

    def _prepare_features(self, feats, b):
        """Hook for MRRP subclasses to unfold branch-folded features."""
        return feats

    @nn.compact
    def __call__(
        self,
        features: Dict[str, Array],
        proposals: Array,  # (B, R, 4)
        proposal_scores: Array,  # (B, R) -inf padding
        image_sizes: Array,
        targets: Optional[Dict[str, Array]] = None,
        train: bool = False,
    ):
        b, r = proposals.shape[:2]
        feats = self._prepare_features([features[f] for f in self.in_features], b)
        feats, gam_logits = self._apply_gam(feats)
        flat_boxes = proposals.reshape(b * r, 4)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
        pooled = self.pooler(feats, flat_boxes, batch_idx, rois_per_image=r)
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
            loss = jax.vmap(
                lambda m, l: mil_image_loss(m, l, self.mean_loss)
            )(mil, img_labels).mean()
            losses = {"loss_mil": loss}
            if gam_logits is not None:
                losses["loss_gam"] = gam_image_loss(gam_logits, img_labels)
            return {}, losses

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
        # raw per-proposal scores: consumed by TTA-AVG (reference
        # test_time_augmentation_avg.py:383-386 averages these across augs)
        detections["proposal_class_scores"] = mil
        return detections, {}


@ROI_HEADS_REGISTRY.register()
class OICRROIHeads(nn.Module):
    """WSDDN MIL + K OICR refinement branches
    (reference roi_heads_oicr.py, fast_rcnn_oicr.py)."""

    num_classes: int
    in_features: Sequence[str]
    pooler: ROIPooler
    refine_num: int = 3
    refine_reg: Sequence[bool] = (False, False, False)
    refine_mist: bool = False
    dan_dims: Sequence[int] = (4096, 4096)
    box2box_transform: Optional[Box2BoxTransform] = None
    score_thresh_test: float = 1e-4
    nms_thresh_test: float = 0.4
    detections_per_image: int = 100
    dtype: Any = jnp.float32
    # per-branch proposal sampling (reference WSL.SAMPLING.* +
    # label_and_sample_proposals_wsl): empty tuple = off
    sampling_on: bool = False
    sampling_iou_thresholds: Sequence[Sequence[float]] = ()
    sampling_iou_labels: Sequence[Sequence[int]] = ()
    sampling_batch_size: Sequence[int] = ()
    sampling_pos_fraction: Sequence[float] = ()
    cascade_on: bool = False  # see CascadeOICRROIHeads
    has_gam: bool = False
    mean_loss: bool = True

    _apply_gam = WSDDNROIHeads._apply_gam

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        base = WSDDNROIHeads.from_config(cfg, input_shape)
        base.pop("dan_dims")
        s = cfg.WSL.SAMPLING
        return dict(
            refine_num=cfg.WSL.REFINE_NUM,
            refine_reg=tuple(cfg.WSL.REFINE_REG[: cfg.WSL.REFINE_NUM]),
            refine_mist=cfg.WSL.REFINE_MIST,
            dan_dims=tuple(cfg.MODEL.ROI_BOX_HEAD.DAN_DIM),
            box2box_transform=Box2BoxTransform(
                weights=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS
            ),
            sampling_on=s.SAMPLING_ON,
            sampling_iou_thresholds=tuple(tuple(t) for t in s.IOU_THRESHOLDS),
            sampling_iou_labels=tuple(tuple(l) for l in s.IOU_LABELS),
            sampling_batch_size=tuple(s.BATCH_SIZE_PER_IMAGE),
            sampling_pos_fraction=tuple(s.POSITIVE_FRACTION),
            **base,
        )

    def _branch_matcher(self, k: int):
        """Per-branch Matcher params when WSL.SAMPLING is on, else the
        default 0.5-IoU OICR labeling."""
        if self.sampling_on and k < len(self.sampling_iou_thresholds):
            return (
                tuple(self.sampling_iou_thresholds[k]),
                tuple(self.sampling_iou_labels[k]),
            )
        return None, None

    def _mine(self, bx, src, v, lbl, img_weights=None):
        """Branch PGT mining: MIST (top-15% + NMS, weights = mined scores)
        when WSL.REFINE_MIST, else top-1 per present class with the
        image-logit weights (reference get_pgt_mist :1038 /
        get_pgt_top_k :1168 need_weight)."""
        if self.refine_mist:
            return get_pgt_mist(bx, src, v, lbl)
        return get_pgt_top_k(bx, src, v, lbl, top_k=1, img_weights=img_weights)

    def _prepare_features(self, feats, b):
        """Hook for MRRP subclasses to unfold branch-folded features."""
        return feats

    def _mil_losses(self, mil, img_labels, proposals, valid, targets):
        """Base MIL image loss; CSCOICRROIHeads overrides with CSC
        weighting (reference roi_heads_csc.py)."""
        return {
            "loss_mil": jax.vmap(
                lambda m, l: mil_image_loss(m, l, self.mean_loss)
            )(mil, img_labels).mean()
        }

    @nn.compact
    def __call__(
        self,
        features: Dict[str, Array],
        proposals: Array,
        proposal_scores: Array,
        image_sizes: Array,
        targets: Optional[Dict[str, Array]] = None,
        train: bool = False,
    ):
        b, r = proposals.shape[:2]
        feats = self._prepare_features(
            [features[f] for f in self.in_features], b
        )
        feats, gam_logits = self._apply_gam(feats)
        flat_boxes = proposals.reshape(b * r, 4)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
        pooled = self.pooler(feats, flat_boxes, batch_idx, rois_per_image=r)
        dan = DiscriminativeAdaptionNeck(dims=self.dan_dims, dtype=self.dtype, name="dan")
        x = dan(pooled, train=train)
        cls_logit, det_logit = MILOutputLayers(
            num_classes=self.num_classes, dtype=self.dtype, name="mil"
        )(x)
        cls_logit = cls_logit.reshape(b, r, -1)
        det_logit = det_logit.reshape(b, r, -1)
        valid = jnp.isfinite(proposal_scores)
        mil = jax.vmap(wsddn_scores)(cls_logit, det_logit, valid)

        refine_heads = [
            OICROutputLayers(
                num_classes=self.num_classes,
                with_reg=self.refine_reg[k] if k < len(self.refine_reg) else False,
                # class-specific regression (reference fast_rcnn_oicr.py:488,
                # CLS_AGNOSTIC_BBOX_REG defaults False in the WSR configs)
                reg_classes=self.num_classes,
                dtype=self.dtype,
                name=f"refine{k}",
            )
            for k in range(self.refine_num)
        ]
        branches = []
        for head_k in refine_heads:
            logits, deltas = head_k(x)
            branches.append(
                (
                    logits.reshape(b, r, -1),
                    deltas.reshape(b, r, -1) if deltas is not None else None,
                )
            )

        if train:
            img_labels = jax.vmap(
                lambda c, v: image_level_gt(c, v, self.num_classes)
            )(targets["gt_classes"], targets["gt_valid"])
            losses = dict(
                self._mil_losses(mil, img_labels, proposals, valid, targets)
            )
            if gam_logits is not None:
                losses["loss_gam"] = gam_image_loss(gam_logits, img_labels)
            # image-level class probabilities: supervision weights of the
            # top-k miner (reference pred_class_img_logits feeding
            # get_pgt_top_k's need_weight path, roi_heads_oicr.py:752)
            img_probs = jnp.clip(mil.sum(axis=1), 1e-6, 1.0 - 1e-6)
            n_prop = jnp.maximum(jnp.sum(valid), 1.0)
            source = mil  # (B, R, C) probabilities
            src_boxes = proposals  # per-class (B, R, C, 4) once reg kicks in
            sampling_rng = self.make_rng("sampling") if self.sampling_on else None
            for k, (logits, deltas) in enumerate(branches):
                has_reg = deltas is not None
                deltas_in = (
                    deltas if has_reg else jnp.zeros((b, r, 4 * self.num_classes))
                )
                thr, labs = self._branch_matcher(k)
                src_k = source  # branch k-1's predictions (mil for k == 0)

                def mine_and_terms(bx, sbx, src, v, lbl, imgw, lg, dl, rng_k, has_reg=has_reg, k=k, thr=thr, labs=labs):
                    pgt = self._mine(sbx, src, v, lbl, imgw)
                    sup = label_proposals_by_pgt(
                        bx, v, pgt, self.num_classes,
                        iou_thresholds=thr, iou_labels=labs,
                    )
                    w = sup["weights"]
                    if self.sampling_on:
                        # reference label_and_sample_proposals_wsl: subsample
                        # BATCH_SIZE_PER_IMAGE[k] at POSITIVE_FRACTION[k]
                        from ...ops.sampling import subsample_labels

                        lbl_s = jnp.where(w > 0, sup["labels"], -1)
                        pos_m, neg_m = subsample_labels(
                            rng_k,
                            lbl_s,
                            self.sampling_batch_size[k],
                            self.sampling_pos_fraction[k],
                            self.num_classes,
                        )
                        w = w * (pos_m | neg_m)
                    cls_sum, cls_cnt = oicr_branch_loss_terms(lg, sup["labels"], w)
                    if has_reg:
                        reg_sum = oicr_reg_loss_sum(
                            dl, sup["labels"], w, sup["fg"], bx,
                            sup["matched_pgt_boxes"], self.box2box_transform,
                        )
                        nxt_boxes = self.box2box_transform.apply_deltas(
                            dl.reshape(-1, 4),
                            jnp.broadcast_to(
                                bx[:, None, :], (bx.shape[0], self.num_classes, 4)
                            ).reshape(-1, 4),
                        ).reshape(bx.shape[0], self.num_classes, 4)
                    else:
                        reg_sum = jnp.asarray(0.0)
                        nxt_boxes = bx
                    # next source: this branch's softmax fg scores
                    nxt = jax.nn.softmax(lg, axis=-1)[:, : self.num_classes]
                    return cls_sum, cls_cnt, reg_sum, nxt, nxt_boxes

                rngs_k = jax.random.split(
                    jax.random.fold_in(sampling_rng, k) if sampling_rng is not None
                    else jax.random.key(0),
                    b,
                )
                cls_sum, cls_cnt, reg_sum, source, src_boxes = jax.vmap(mine_and_terms)(
                    proposals,
                    jax.lax.stop_gradient(src_boxes),
                    jax.lax.stop_gradient(src_k),
                    valid,
                    img_labels,
                    img_probs,
                    logits,
                    deltas_in,
                    rngs_k,
                )
                # MIST branch-0 upweighting (reference roi_heads_jtsm.py:682);
                # batch-level normalizers (fast_rcnn_oicr.py:297 / :378)
                term_weight = 3.0 if (self.refine_mist and k == 0) else 1.0
                losses[f"loss_refine_cls{k}"] = (
                    cls_sum.sum() / jnp.maximum(cls_cnt.sum(), 1.0) * term_weight
                )
                if has_reg:
                    losses[f"loss_refine_reg{k}"] = (
                        reg_sum.sum() / n_prop * term_weight
                    )

                if self.cascade_on and k > 0:
                    # cascade (reference roi_heads_all.py:3081-3099 under
                    # WSL.CASCADE_ON): augment branch k's supervised set with
                    # boxes MIST-mined from branch k-1 — pooled + necked as
                    # extra proposals and supervised as foreground of their
                    # mined class, weighted by the mining confidence
                    def mine_extra(bx, src, v, lbl):
                        m = get_pgt_mist(bx, src, v, lbl)
                        return (
                            m["boxes"].reshape(-1, 4),
                            m["weight"].reshape(-1),
                            m["valid"].reshape(-1),
                            m["classes"].reshape(-1),
                        )

                    eb, ew, ev, ec = jax.vmap(mine_extra)(
                        proposals,
                        jax.lax.stop_gradient(src_k),
                        valid,
                        img_labels,
                    )
                    e = eb.shape[1]
                    pooled_e = self.pooler(
                        feats,
                        eb.reshape(b * e, 4),
                        jnp.repeat(jnp.arange(b, dtype=jnp.int32), e),
                        rois_per_image=e,
                    )
                    lg_e, _ = refine_heads[k](dan(pooled_e, train=train))
                    lg_e = lg_e.reshape(b, e, -1)
                    ce = jax.vmap(
                        lambda lg, cls, w, v2: oicr_branch_loss(
                            lg,
                            jnp.where(v2, cls, self.num_classes),
                            jnp.where(v2, w, 0.0),
                        )
                    )(lg_e, ec, ew, ev)
                    losses[f"loss_refine_cls{k}_cascade"] = ce.mean()
            return {}, losses

        # inference: branch-averaged softmax scores and branch-averaged
        # class-specific deltas decoded once (reference
        # OICROutputLayers.inference -> predict_probs_K / predict_boxes_K)
        avg = jnp.zeros((b, r, self.num_classes))
        for logits, _ in branches:
            avg = avg + jax.nn.softmax(logits, axis=-1)[..., : self.num_classes]
        avg = avg / max(self.refine_num, 1)

        final_boxes = proposals
        reg_deltas = [d for _, d in branches if d is not None]
        if reg_deltas:
            mean_deltas = sum(reg_deltas) / len(reg_deltas)
            final_boxes = self.box2box_transform.apply_deltas(
                mean_deltas.reshape(-1, 4),
                jnp.broadcast_to(
                    proposals[:, :, None, :], (b, r, self.num_classes, 4)
                ).reshape(-1, 4),
            ).reshape(b, r, self.num_classes, 4)

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
        )(final_boxes, avg, valid, image_sizes)
        detections["proposal_class_scores"] = avg
        return detections, {}


@ROI_HEADS_REGISTRY.register()
class CascadeOICRROIHeads(OICRROIHeads):
    """Cascade OICR (reference roi_heads_all.py:2822, WSL.CASCADE_ON path
    :3081-3099): refinement branch k > 0 augments its supervised set with
    boxes MIST-mined from branch k-1's predictions. The mined boxes are
    pooled through the shared neck as extra proposals and supervised as
    foreground of their mined class, weighted by the mining confidence —
    a fixed C x 32 extra rows per image keeps shapes static. Inference is
    standard OICR branch averaging."""

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        ret = OICRROIHeads.from_config(cfg, input_shape)
        ret["cascade_on"] = cfg.WSL.CASCADE_ON
        return ret


@ROI_HEADS_REGISTRY.register()
class MRRPOICRROIHeads(OICRROIHeads):
    """OICR over a Multi-Rate Receptive Pyramid backbone (reference
    roi_heads_all.py:4620): the MRRP backbone folds its dilation branches
    into the batch dim ((B*N, H, W, C)); the reference chunks them back and
    pools every branch (:4830-4833). Condensed static-shape equivalent:
    average the branch feature maps before pooling, so each ROI sees the
    multi-rate context with one pooled row per proposal."""

    mrrp_num_branch: int = 1

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        ret = OICRROIHeads.from_config(cfg, input_shape)
        ret["mrrp_num_branch"] = (
            cfg.MODEL.MRRP.NUM_BRANCH if cfg.MODEL.MRRP.MRRP_ON else 1
        )
        return ret

    def _prepare_features(self, feats, b):
        if self.mrrp_num_branch <= 1:
            return feats
        out = []
        for f in feats:
            if f.shape[0] > b:
                nb = f.shape[0] // b
                out.append(
                    jnp.mean(f.reshape(nb, b, *f.shape[1:]), axis=0)
                )
            else:
                out.append(f)
        return out


@ROI_HEADS_REGISTRY.register()
class TridentOICRROIHeads(MRRPOICRROIHeads):
    """Reference config-zoo alias for the MRRP/trident OICR head
    (reg_all/oicr_TRD_*.yaml name)."""


@ROI_HEADS_REGISTRY.register()
class MRRPWSDDNROIHeads(WSDDNROIHeads):
    """WSDDN over a Multi-Rate Receptive Pyramid backbone (reference
    roi_heads_all.py:809): branch-folded (B*N, H, W, C) features are
    averaged over the dilation branches before pooling (same condensation
    as MRRPOICRROIHeads)."""

    mrrp_num_branch: int = 1

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        ret = WSDDNROIHeads.from_config(cfg, input_shape)
        ret["mrrp_num_branch"] = (
            cfg.MODEL.MRRP.NUM_BRANCH if cfg.MODEL.MRRP.MRRP_ON else 1
        )
        return ret

    _prepare_features = MRRPOICRROIHeads._prepare_features


from ...modeling.roi_heads.res5_roi_heads import Res5ROIHeads as _Res5ROIHeads  # noqa: E402


@ROI_HEADS_REGISTRY.register()
class WSRes5ROIHeads(_Res5ROIHeads):
    """Reference config-zoo name (wsl/modeling/roi_heads/roi_heads.py:410)
    for the fully-supervised C4 Res5 second stage over a WS-ResNet trunk —
    structurally identical to the core Res5ROIHeads; registered so the
    reference faster_rcnn_WSR_*_C4 yamls work verbatim."""


from ...modeling.roi_heads.box_head import ROI_BOX_HEAD_REGISTRY  # noqa: E402

ROI_BOX_HEAD_REGISTRY._do_register(
    "DiscriminativeAdaptionNeck", DiscriminativeAdaptionNeck
)
