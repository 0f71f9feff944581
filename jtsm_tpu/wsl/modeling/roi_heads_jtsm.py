"""JTSMROIHeads — joint thing-and-stuff mining (reference:
projects/WSL/wsl/modeling/roi_heads/roi_heads_jtsm.py:198).

Key machinery mapped to static shapes:
* MOIPool superpixel-masked pooling + mask-area rescale (:608-630)
* joint thing+stuff MIL via TSM scoring (fast_rcnn_tsm.py:490-586)
* K OICR refinement branches on mined top-k PGT (:678, :1168)
* mask PGT mining with superpixel-union object evidence (:754-852, the
  GrabCut path (:1820) is a host-side alternative, see wsl/evidence.py)
* pseudo sem-seg painting for the stuff branch (:2024 ``get_pgt_sem_seg``)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import ShapeSpec
from ...modeling.poolers import ROIPooler
from ...modeling.roi_heads.mask_head import build_mask_head, mask_rcnn_inference
from ...modeling.roi_heads.roi_heads import ROI_HEADS_REGISTRY
from ...ops.box_regression import Box2BoxTransform
from ...ops.losses import binary_cross_entropy_with_logits, smooth_l1_loss
from ..ops import moi_pool
from .mil_heads import (
    MILOutputLayers,
    OICROutputLayers,
    get_pgt_top_k,
    label_proposals_by_pgt,
    mil_image_loss,
    oicr_branch_loss,
    wsddn_scores,
)
from .roi_heads_wsl import (
    DiscriminativeAdaptionNeck,
    image_level_gt,
    image_level_gt_stuff,
    wsl_inference_single,
)

Array = jax.Array


def superpixel_union_mask_crop(
    superpixels: Array,  # (Hs, Ws) int32
    oh_labels_r: Array,  # (S,) membership of ONE proposal
    box: Array,  # (4,)
    mask_size: int,
) -> Array:
    """Object evidence: the union of the proposal's member superpixels,
    cropped to the box at mask_size (reference object_evidence :1924, sp
    mode)."""
    hs, ws = superpixels.shape
    x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
    ys = jnp.clip(
        (y0 + (jnp.arange(mask_size) + 0.5) / mask_size * (y1 - y0)).astype(jnp.int32),
        0,
        hs - 1,
    )
    xs = jnp.clip(
        (x0 + (jnp.arange(mask_size) + 0.5) / mask_size * (x1 - x0)).astype(jnp.int32),
        0,
        ws - 1,
    )
    sp = superpixels[ys[:, None], xs[None, :]]
    return oh_labels_r[sp]


@ROI_HEADS_REGISTRY.register()
class JTSMROIHeads(nn.Module):
    num_classes: int  # things
    num_classes_stuff: int  # stuff classes incl. class 0 = "things"
    in_features: Sequence[str]
    pooler: ROIPooler
    refine_num: int = 4
    refine_reg: Sequence[bool] = (True, True, True, True)
    dan_dims: Sequence[int] = (4096, 4096)
    box2box_transform: Optional[Box2BoxTransform] = None
    sp_on: bool = True
    ps_on: bool = True
    use_obn: bool = True
    mask_on: bool = True
    mask_head: Optional[nn.Module] = None
    mask_pooler: Optional[ROIPooler] = None
    mask_mined_top_k: int = 3
    mask_size: int = 28
    mask_capacity: int = 64  # mined mask rois per image (static)
    score_thresh_test: float = 1e-4
    nms_thresh_test: float = 0.4
    detections_per_image: int = 100
    sem_seg_ignore: int = 255
    dtype: Any = jnp.float32

    @property
    def joint_classes(self) -> int:
        return self.num_classes + self.num_classes_stuff - 1

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
        ret = dict(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            num_classes_stuff=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            in_features=in_features,
            pooler=pooler,
            refine_num=cfg.WSL.REFINE_NUM,
            refine_reg=tuple(cfg.WSL.REFINE_REG[: cfg.WSL.REFINE_NUM]),
            dan_dims=tuple(cfg.MODEL.ROI_BOX_HEAD.DAN_DIM),
            box2box_transform=Box2BoxTransform(
                weights=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS
            ),
            sp_on=cfg.WSL.SP_ON,
            ps_on=cfg.WSL.PS_ON,
            use_obn=cfg.WSL.USE_OBN,
            mask_on=cfg.MODEL.MASK_ON,
            mask_mined_top_k=cfg.WSL.MASK_MINED_TOP_K,
            score_thresh_test=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            nms_thresh_test=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            sem_seg_ignore=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            dtype=dtype,
        )
        if cfg.MODEL.MASK_ON:
            mask_res = cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION
            ret["mask_head"] = build_mask_head(
                cfg,
                ShapeSpec(
                    channels=input_shape[in_features[0]].channels,
                    height=mask_res,
                    width=mask_res,
                ),
            )
            ret["mask_pooler"] = ROIPooler(
                output_size=mask_res,
                scales=tuple(1.0 / input_shape[f].stride for f in in_features),
                sampling_ratio=cfg.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO,
                pooler_type="ROIAlignV2",
            )
            ret["mask_size"] = mask_res * 2
        return ret

    @nn.compact
    def __call__(
        self,
        features: Dict[str, Array],
        proposals: Array,  # (B, R, 4)
        proposal_scores: Array,  # (B, R)
        image_sizes: Array,
        targets: Optional[Dict[str, Array]] = None,
        train: bool = False,
        superpixels: Optional[Array] = None,  # (B, Hs, Ws)
        oh_labels: Optional[Array] = None,  # (B, R, S)
    ):
        feat = features[self.in_features[0]]  # (B, Hf, Wf, C) single level
        b, r = proposals.shape[:2]
        spatial_scale = self.pooler.scales[0]
        p = self.pooler.output_size[0]

        valid = jnp.isfinite(proposal_scores)

        if self.sp_on and superpixels is not None and oh_labels is not None:
            pooled, valid_frac = jax.vmap(
                lambda f, bx, sp, oh: moi_pool(
                    f, bx, sp, oh, spatial_scale, p, self.pooler.sampling_ratio
                )
            )(feat, proposals, superpixels, oh_labels)
            pooled = pooled.reshape(b * r, p, p, -1)
            # mask-area rescale (reference :615-630): weight proposal features
            # by how much of the box the superpixel mask covers
            area_ratio = jnp.clip(valid_frac.mean(axis=(2, 3)), 1e-3, 1.0)  # (B, R)
        else:
            flat_boxes = proposals.reshape(b * r, 4)
            batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
            pooled = self.pooler([feat], flat_boxes, batch_idx)
            area_ratio = jnp.ones((b, r))

        x = DiscriminativeAdaptionNeck(dims=self.dan_dims, dtype=self.dtype, name="dan")(
            pooled, train=train
        )
        cls_logit, det_logit = MILOutputLayers(
            num_classes=self.joint_classes, dtype=self.dtype, name="mil"
        )(x)
        cls_logit = cls_logit.reshape(b, r, -1)
        det_logit = det_logit.reshape(b, r, -1)
        # mask-area + objectness weighting (:615-633): both act as additive
        # shifts on the detection logits (multiplicative on the softmax-ed
        # proposal distribution)
        det_logit = det_logit + jnp.log(jnp.clip(area_ratio, 1e-6))[:, :, None]
        if self.use_obn:
            obj = jnp.where(valid, jax.nn.sigmoid(proposal_scores), 1e-6)
            det_logit = det_logit + jnp.log(obj)[:, :, None]

        mil = jax.vmap(wsddn_scores)(cls_logit, det_logit, valid)  # (B, R, Cj)

        branches = []
        for k in range(self.refine_num):
            logits, deltas = OICROutputLayers(
                num_classes=self.joint_classes,
                with_reg=self.refine_reg[k] if k < len(self.refine_reg) else False,
                dtype=self.dtype,
                name=f"refine{k}",
            )(x)
            branches.append(
                (
                    logits.reshape(b, r, -1),
                    deltas.reshape(b, r, -1) if deltas is not None else None,
                )
            )

        if train:
            return self._losses(
                proposals, valid, mil, branches, targets, superpixels, oh_labels, b, r, feat
            )
        return self._inference(
            proposals, valid, mil, branches, image_sizes, feat, b, r
        )

    # ------------------------------------------------------------------
    def _joint_labels(self, targets, b):
        thing = jax.vmap(lambda c, v: image_level_gt(c, v, self.num_classes))(
            targets["gt_classes"], targets["gt_valid"]
        )
        if self.ps_on and "gt_sem_seg" in targets:
            stuff = jax.vmap(
                lambda s: image_level_gt_stuff(
                    s, self.num_classes_stuff, self.sem_seg_ignore
                )
            )(targets["gt_sem_seg"])
            stuff = stuff[:, 1:]  # drop class 0 = "things"
        else:
            stuff = jnp.zeros((b, self.num_classes_stuff - 1))
        return jnp.concatenate([thing, stuff], axis=1)

    def _losses(self, proposals, valid, mil, branches, targets, superpixels, oh_labels, b, r, feat):
        img_labels = self._joint_labels(targets, b)
        losses = {"loss_mil": jax.vmap(mil_image_loss)(mil, img_labels).mean()}

        source = mil
        for k, (logits, deltas) in enumerate(branches):
            has_reg = deltas is not None
            deltas_in = deltas if has_reg else jnp.zeros((b, r, 4))

            def mine_and_loss(bx, src, v, lbl, lg, dl, has_reg=has_reg):
                pgt = get_pgt_top_k(bx, src, v, lbl, top_k=1)
                sup = label_proposals_by_pgt(bx, v, pgt, self.joint_classes)
                loss_cls = oicr_branch_loss(lg, sup["labels"], sup["weights"])
                if has_reg:
                    t = self.box2box_transform.get_deltas(bx, sup["matched_pgt_boxes"])
                    reg = smooth_l1_loss(dl, t, 0.0).sum(-1)
                    fg_w = sup["weights"] * sup["fg"]
                    loss_reg = jnp.sum(reg * fg_w) / jnp.maximum(jnp.sum(fg_w > 0), 1.0)
                else:
                    loss_reg = jnp.asarray(0.0)
                nxt = jax.nn.softmax(lg, axis=-1)[:, : self.joint_classes]
                return loss_cls, loss_reg, nxt

            loss_cls, loss_reg, source = jax.vmap(mine_and_loss)(
                proposals,
                jax.lax.stop_gradient(source),
                valid,
                img_labels,
                branches[k][0],
                deltas_in,
            )
            losses[f"loss_refine_cls{k}"] = loss_cls.mean()
            if has_reg:
                losses[f"loss_refine_reg{k}"] = loss_reg.mean()

        aux = {}
        if self.ps_on and superpixels is not None:
            aux["pgt_sem_seg"] = self._mine_sem_seg(
                proposals, valid, jax.lax.stop_gradient(source), img_labels, superpixels, oh_labels
            )
        if self.mask_on and superpixels is not None:
            losses.update(
                self._mask_losses(
                    proposals,
                    valid,
                    jax.lax.stop_gradient(source),
                    img_labels,
                    superpixels,
                    oh_labels,
                    feat,
                    b,
                    r,
                )
            )
        return aux, losses

    def _mine_sem_seg(self, proposals, valid, scores, img_labels, superpixels, oh_labels):
        """Paint mined top-1 masks into a per-pixel pseudo sem-seg label map
        (reference get_pgt_sem_seg :2024): stuff classes at their stuff id,
        mined things as class 0; everything else ignore."""
        b = proposals.shape[0]
        hs, ws = superpixels.shape[1:]
        cj = self.joint_classes
        ct = self.num_classes

        def one(bx, v, sc, lbl, sp, oh):
            pgt = get_pgt_top_k(bx, sc, v, lbl, top_k=1)
            ridx = pgt["idx"][:, 0]  # (Cj,)
            present = pgt["valid"][:, 0]  # (Cj,)
            # the painted label is constant WITHIN a superpixel, so resolve
            # the class-painting order in superpixel space (Cj x S table)
            # and gather per pixel ONCE. The previous per-(class, pixel)
            # gather was 72% of the JTSM train step (432 ms at batch 4).
            ohc = oh[ridx]  # (Cj, S)
            vals_sp = ohc & present[:, None]  # (Cj, S)
            # reference paints class-by-class in order => LAST class wins
            last_sp = (cj - 1) - jnp.argmax(vals_sp[::-1], axis=0)  # (S,)
            any_sp = vals_sp.any(axis=0)  # (S,)
            paint_vals = jnp.where(
                jnp.arange(cj) < ct, 0, jnp.arange(cj) - ct + 1
            ).astype(jnp.int32)
            out_sp = jnp.where(
                any_sp, paint_vals[last_sp], jnp.int32(self.sem_seg_ignore)
            )  # (S,)
            return out_sp[sp]  # (hs, ws): one per-pixel gather

        return jax.vmap(one)(proposals, valid, scores, img_labels, superpixels, oh_labels)

    def _mask_losses(self, proposals, valid, scores, img_labels, superpixels, oh_labels, feat, b, r):
        """Mine mask PGT (top-1 per present thing class + top-k neighbors) and
        train the mask head with superpixel-union targets (reference
        _forward_mask :754)."""
        from ...modeling.roi_heads.mask_head import mask_rcnn_loss

        cm = min(self.mask_capacity, self.num_classes)

        def mine(bx, v, sc, lbl, sp, oh):
            thing_scores = sc[:, : self.num_classes]
            pgt = get_pgt_top_k(bx, thing_scores, v, lbl[: self.num_classes], top_k=1)
            # take up to cm mined rois (one per class, ranked by weight)
            w = pgt["weight"][:, 0]
            topw, topc = jax.lax.top_k(w, cm)
            ridx = pgt["idx"][topc, 0]
            boxes = bx[ridx]
            cls = topc
            ok = pgt["valid"][topc, 0] & (topw > 0)
            targets = jax.vmap(
                lambda rid, bb: superpixel_union_mask_crop(sp, oh[rid], bb, self.mask_size)
            )(ridx, boxes)
            return boxes, cls, ok, targets, topw

        boxes, cls, ok, mask_targets, weights = jax.vmap(mine)(
            proposals, valid, scores, img_labels, superpixels, oh_labels
        )
        flat_boxes = boxes.reshape(b * cm, 4)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), cm)
        mask_feats = self.mask_pooler([feat], flat_boxes, batch_idx)
        mask_logits = self.mask_head(mask_feats)
        loss = mask_rcnn_loss(
            mask_logits,
            cls.reshape(-1),
            mask_targets.reshape(b * cm, self.mask_size, self.mask_size).astype(jnp.float32),
            ok.reshape(-1),
        )
        return {"loss_mask": loss}

    def _inference(self, proposals, valid, mil, branches, image_sizes, feat, b, r):
        avg = jnp.zeros((b, r, self.joint_classes))
        for logits, _ in branches:
            avg = avg + jax.nn.softmax(logits, axis=-1)[..., : self.joint_classes]
        avg = avg / max(self.refine_num, 1)

        final_boxes = proposals
        last_deltas = branches[-1][1]
        if last_deltas is not None:
            final_boxes = self.box2box_transform.apply_deltas(
                last_deltas.reshape(-1, 4), proposals.reshape(-1, 4)
            ).reshape(b, r, 4)

        thing_scores = avg[..., : self.num_classes]
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
        )(final_boxes, thing_scores, valid, image_sizes)
        # raw per-proposal thing scores for TTA-AVG averaging (reference
        # test_time_augmentation_avg.py:383-386)
        detections["proposal_class_scores"] = thing_scores

        if self.mask_on and self.mask_head is not None:
            d = detections["boxes"].shape[1]
            det_boxes = detections["boxes"].reshape(b * d, 4)
            det_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
            mask_feats = self.mask_pooler([feat], det_boxes, det_batch)
            mask_logits = self.mask_head(mask_feats)
            probs = mask_rcnn_inference(mask_logits, detections["classes"].reshape(-1))
            detections["masks"] = probs.reshape(b, d, probs.shape[-2], probs.shape[-1])
        return detections, {}
