"""The WSOD method zoo: ContextLocNet, PCL, CMIL, CSC, UWSOD heads.

Reference: projects/WSL/wsl/modeling/roi_heads/
* roi_heads_contextlocnet.py (403 LoC) — frame/context ROIs via ROILoopPool;
  det branch scores = softmax(frame - context)
* roi_heads_pcl.py (437) — proposal clusters (greedy graph centers) + the
  pcl_loss supervision
* roi_heads_cmil.py (826) + csrc/ROIMerge — continuation optimization:
  cluster proposals by score similarity + IoU, merge cls/det scores
* roi_heads_csc.py (570) + csrc/csc — class peak gradient (CPG) maps from
  the gradient of the image class score w.r.t. the input image; CSC turns
  CPG + boxes into per-proposal positive/negative weights
* roi_heads_uwsod.py (1441) — unified WSOD with a learned RPN trained from
  mined PGT

All static-shape; each head registers in ROI_HEADS_REGISTRY.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...modeling.roi_heads.roi_heads import ROI_HEADS_REGISTRY
from ...ops.box_regression import Box2BoxTransform
from ...structures.boxes import pairwise_iou
from ..ops import roi_loop_pool
from .mil_heads import (
    MILOutputLayers,
    OICROutputLayers,
    gam_image_loss,
    get_pgt_top_k,
    label_proposals_by_pgt,
    mil_image_loss,
    oicr_branch_loss,
    wsddn_scores,
)
from .roi_heads_wsl import (
    DiscriminativeAdaptionNeck,
    WSDDNROIHeads,
    image_level_gt,
    wsl_inference_single,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# ContextLocNet
# ---------------------------------------------------------------------------


@ROI_HEADS_REGISTRY.register()
class ContextLocNetROIHeads(WSDDNROIHeads):
    """Det branch scores frame-minus-context (reference
    roi_heads_contextlocnet.py, 'contrastive S' model)."""

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
        feats = [features[f] for f in self.in_features]
        b, r = proposals.shape[:2]
        flat = proposals.reshape(b * r, 4)
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)

        # reference-exact ROILoopPool: [roi, frame(roi minus inner), context
        # (outer minus roi)] blocks (csrc/ROILoopPool, pinned in
        # tests/test_wsl_parity.py)
        pooled_all = roi_loop_pool(
            feats[0],
            flat,
            bidx,
            self.pooler.scales[0],
            output_size=self.pooler.output_size[0],
        )
        n = b * r
        pooled_roi = pooled_all[:n]
        pooled_frame = pooled_all[n : 2 * n]
        pooled_ctx = pooled_all[2 * n :]

        dan = DiscriminativeAdaptionNeck(dims=self.dan_dims, dtype=self.dtype, name="dan")
        x_roi = dan(pooled_roi, train=train)
        x_frame = dan(pooled_frame, train=train)
        x_ctx = dan(pooled_ctx, train=train)

        mil = MILOutputLayers(num_classes=self.num_classes, dtype=self.dtype, name="mil")
        cls_logit, _ = mil(x_roi)
        _, det_frame = mil(x_frame)
        _, det_ctx = mil(x_ctx)
        det_logit = det_frame - det_ctx  # contrastive localization

        cls_logit = cls_logit.reshape(b, r, -1)
        det_logit = det_logit.reshape(b, r, -1)
        valid = jnp.isfinite(proposal_scores)
        scores = jax.vmap(wsddn_scores)(cls_logit, det_logit, valid)

        if train:
            img_labels = jax.vmap(
                lambda c, v: image_level_gt(c, v, self.num_classes)
            )(targets["gt_classes"], targets["gt_valid"])
            return {}, {"loss_mil": jax.vmap(lambda _m, _l: mil_image_loss(_m, _l, self.mean_loss))(scores, img_labels).mean()}

        detections = jax.vmap(
            lambda bx, sc, v, sz: wsl_inference_single(
                bx, sc, v, sz, self.score_thresh_test, self.nms_thresh_test, self.detections_per_image
            )
        )(proposals, scores, valid, image_sizes)
        return detections, {}


# ---------------------------------------------------------------------------
# PCL: proposal cluster learning
# ---------------------------------------------------------------------------


def build_proposal_clusters(
    boxes: Array,  # (R, 4)
    source_scores: Array,  # (R, C)
    valid: Array,
    image_labels: Array,  # (C,)
    num_centers: int = 5,
    iou_thresh: float = 0.4,
) -> Dict[str, Array]:
    """Greedy cluster centers per present class: top-k scoring proposals with
    NMS-style diversity; every proposal joins its best-IoU center
    (reference third_party pcl.py `_get_graph_centers`, simplified to a
    static top-k + assignment)."""
    from ...ops.nms import nms_mask

    c = source_scores.shape[1]

    def per_class(sc, present):
        masked = jnp.where(valid, sc, -jnp.inf)
        k = min(num_centers * 3, boxes.shape[0])
        topv, topi = jax.lax.top_k(masked, k)
        keep = nms_mask(boxes[topi], topv, iou_thresh)
        pri = jnp.where(keep, topv, -jnp.inf)
        cv, ci = jax.lax.top_k(pri, num_centers)
        centers = topi[ci]
        ok = jnp.isfinite(cv) & present
        return centers, jnp.where(ok, cv, 0.0), ok

    centers, weights, ok = jax.vmap(per_class)(
        source_scores.T, image_labels > 0
    )  # (C, K)
    center_boxes = boxes[centers]  # (C, K, 4)
    iou = pairwise_iou(boxes, center_boxes.reshape(-1, 4))  # (R, C*K)
    iou = jnp.where(ok.reshape(-1)[None, :], iou, -1.0)
    best = jnp.max(iou, axis=1)
    assign = jnp.argmax(iou, axis=1)
    cls_of_cluster = jnp.repeat(jnp.arange(c), centers.shape[1])
    labels = jnp.where(best >= 0.5, cls_of_cluster[assign], c)
    w = jnp.where(valid, weights.reshape(-1)[assign], 0.0)
    # reference third_party/pcl.py _get_proposal_clusters layout: bg-first
    # labels (0 = background), iou < 0.1 -> weight 0 (ignored), fg membership
    # + per-cluster aggregates for the true PCL cluster loss
    fg = best >= 0.5
    w_ref = jnp.where(best < 0.1, 0.0, w)
    labels_ref = jnp.where(fg, cls_of_cluster[assign] + 1, 0)
    assign_ref = jnp.where(fg & valid, assign, -1)
    g = centers.size
    member = (assign_ref[:, None] == jnp.arange(g)[None, :]).astype(jnp.float32)
    return {
        "labels": labels,
        "weights": w,
        "assignment": assign,
        "center_ok": ok.reshape(-1),
        "labels_ref": labels_ref,
        "weights_ref": w_ref,
        "assignment_ref": assign_ref,
        "pc_labels": cls_of_cluster + 1,
        "pc_count": member.sum(axis=0),
        "img_cls_loss_weights": (member * w_ref[:, None]).sum(axis=0),
    }


@ROI_HEADS_REGISTRY.register()
class PCLROIHeads(WSDDNROIHeads):
    """WSDDN MIL + refinement branches supervised by proposal clusters."""

    refine_num: int = 3

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape):
        ret = WSDDNROIHeads.from_config(cfg, input_shape)
        ret["refine_num"] = cfg.WSL.REFINE_NUM
        return ret

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
        feats = [features[f] for f in self.in_features]
        feats, gam_logits = self._apply_gam(feats)
        b, r = proposals.shape[:2]
        flat = proposals.reshape(b * r, 4)
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
        pooled = self.pooler(feats, flat, bidx, rois_per_image=r)
        x = DiscriminativeAdaptionNeck(dims=self.dan_dims, dtype=self.dtype, name="dan")(
            pooled, train=train
        )
        cls_logit, det_logit = MILOutputLayers(
            num_classes=self.num_classes, dtype=self.dtype, name="mil"
        )(x)
        cls_logit = cls_logit.reshape(b, r, -1)
        det_logit = det_logit.reshape(b, r, -1)
        valid = jnp.isfinite(proposal_scores)
        mil = jax.vmap(wsddn_scores)(cls_logit, det_logit, valid)

        branches = []
        for k in range(self.refine_num):
            logits, _ = OICROutputLayers(
                num_classes=self.num_classes, dtype=self.dtype, name=f"refine{k}"
            )(x)
            branches.append(logits.reshape(b, r, -1))

        if train:
            img_labels = jax.vmap(
                lambda c, v: image_level_gt(c, v, self.num_classes)
            )(targets["gt_classes"], targets["gt_valid"])
            losses = {"loss_mil": jax.vmap(lambda _m, _l: mil_image_loss(_m, _l, self.mean_loss))(mil, img_labels).mean()}
            if gam_logits is not None:
                losses["loss_gam"] = gam_image_loss(gam_logits, img_labels)
            source = mil
            for k, logits in enumerate(branches):
                def one(bx, src, v, lbl, lg):
                    from ..ops import pcl_losses

                    clusters = build_proposal_clusters(bx, src, v, lbl)
                    # true PCL cluster loss (csrc/pcl_loss): probs bg-FIRST
                    p = jax.nn.softmax(lg, -1)  # (R, C+1), bg last in repo
                    p_bgfirst = jnp.concatenate([p[:, -1:], p[:, :-1]], axis=1)
                    loss = pcl_losses(
                        p_bgfirst,
                        clusters["labels_ref"],
                        clusters["weights_ref"],
                        clusters["assignment_ref"],
                        clusters["pc_labels"],
                        clusters["pc_count"],
                        clusters["img_cls_loss_weights"],
                        jnp.concatenate([jnp.ones(1), lbl]),
                    )
                    return loss, p[:, : self.num_classes]

                loss_k, source = jax.vmap(one)(
                    proposals, jax.lax.stop_gradient(source), valid, img_labels, logits
                )
                losses[f"loss_refine_cls{k}"] = loss_k.mean()
            return {}, losses

        avg = sum(jax.nn.softmax(l, -1)[..., : self.num_classes] for l in branches) / max(
            self.refine_num, 1
        )
        detections = jax.vmap(
            lambda bx, sc, v, sz: wsl_inference_single(
                bx, sc, v, sz, self.score_thresh_test, self.nms_thresh_test, self.detections_per_image
            )
        )(proposals, avg, valid, image_sizes)
        return detections, {}


# ---------------------------------------------------------------------------
# CMIL: ROIMerge continuation
# ---------------------------------------------------------------------------


def roi_merge_lambda(cur_iter: Array, max_epoch: float, size_epoch: float) -> Array:
    """The continuation schedule (reference ROIMerge_cpu.cpp ``getlambda``):
    0 at iter 0 -> 1 at max_epoch epochs, logarithmic ramp."""
    low = 0.01
    x = cur_iter / size_epoch
    return (jnp.log(x + low) - jnp.log(low)) / (jnp.log(max_epoch + low) - jnp.log(low))


def roi_merge(
    objectness: Array,  # (R,) sort scores S
    iou: Array,  # (R, R) proposal IoU matrix J
    cls_scores: Array,  # (R, C)
    det_scores: Array,  # (R, C)
    lam: Array,  # scalar clique threshold (see roi_merge_lambda)
    top_cap: int = 200,
    window: int = 40,
) -> Dict[str, Array]:
    """Continuation MIL merging, exactly the reference
    csrc/ROIMerge/ROIMerge_cpu.cpp forward: proposals are visited in
    descending objectness order; each unassigned pivot opens a clique, and
    the next ``window`` unassigned candidates (by score order, within the
    ``top_cap`` prefix) join if their IoU to EVERY current member is >= the
    continuation threshold lambda. Unvisited proposals become singletons.
    Cluster scores are the member means.

    Static-shape redesign: instead of the reference's dynamic (num_id, C)
    output, returns dense per-cluster rows (R, C) (rows >= num_id are zero),
    the per-roi cluster ``ids`` and member ``counts``. Gradients flow
    through the member-mean like the reference backward (d/dC = G[id]/count).
    """
    r = objectness.shape[0]
    order = jnp.argsort(-objectness)
    top_k = min(top_cap, r)
    w = min(window, top_k)
    # -inf objectness marks padding rows (the reference never sees padding):
    # they may neither pivot nor join a clique — they fall through to the
    # singleton tail so their garbage scores cannot contaminate member means
    row_valid = jnp.isfinite(objectness)

    def pivot_body(t, carry):
        ids, cur_id = carry
        n = order[t]
        is_new = (ids[n] == -1) & row_valid[n]
        ids = ids.at[n].set(jnp.where(is_new, cur_id, ids[n]))
        win_tts = t + jnp.arange(w)
        win_idx = order[jnp.minimum(win_tts, r - 1)]
        win_in = win_tts < top_k

        def cand_body(j, ids):
            i = win_idx[j]
            unassigned = ids[i] == -1
            members = (ids[win_idx] == cur_id) & win_in
            ok_clique = jnp.all(jnp.where(members, iou[i, win_idx] >= lam, True))
            take = is_new & win_in[j] & unassigned & ok_clique & row_valid[i]
            return ids.at[i].set(jnp.where(take, cur_id, ids[i]))

        ids = jax.lax.fori_loop(0, w, cand_body, ids)
        return ids, cur_id + jnp.where(is_new, 1, 0)

    ids, cur_id = jax.lax.fori_loop(
        0,
        top_k,
        pivot_body,
        (jnp.full((r,), -1, jnp.int32), jnp.asarray(0, jnp.int32)),
    )
    # remaining unassigned rois become singleton clusters, in index order
    unassigned = ids == -1
    rank = jnp.cumsum(unassigned) - 1
    ids = jnp.where(unassigned, cur_id + rank, ids)
    num_id = cur_id + unassigned.sum()

    onehot = (ids[:, None] == jnp.arange(r)[None, :]).astype(cls_scores.dtype)
    counts = onehot.sum(axis=0)  # (R,) members per cluster row
    denom = jnp.maximum(counts, 1.0)[:, None]
    merged_cls = (onehot.T @ cls_scores) / denom
    merged_det = (onehot.T @ det_scores) / denom
    return {
        "merged_cls": merged_cls,
        "merged_det": merged_det,
        "ids": ids,
        "counts": counts,
        "num_id": num_id,
        "row_valid": jnp.arange(r) < num_id,
    }


@ROI_HEADS_REGISTRY.register()
class CMILROIHeads(WSDDNROIHeads):
    """Continuation MIL (reference roi_heads_cmil.py): the merged-cluster
    MIL head plus WSL.REFINE_NUM OICR refinement branches whose (label,
    weight) supervision comes from the ROILabel op (reference :419-445 —
    S = previous branch scores, U = proposal IoU, L = image labels,
    CW = predicted image logits; thresholds 0.6/0.4/0.1, top_k 1).
    Inference ensembles the branch softmaxes (reference :471-478)."""

    max_iter: int = 35000
    size_epoch: float = 5000.0
    refine_num: int = 4
    refine_reg: Sequence[bool] = (False, False, False, False)
    # WSL.CMIL (reference fast_rcnn_wsddn.py:567): gates the continuation
    # roi_merge inside the WSDDN scoring; False degrades to plain WSDDN
    # scoring with the ROILabel-supervised branches kept
    continuation_on: bool = True
    box2box_transform: Optional[Box2BoxTransform] = None

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape):
        ret = WSDDNROIHeads.from_config(cfg, input_shape)
        ret["max_iter"] = cfg.SOLVER.MAX_ITER
        ret["size_epoch"] = float(cfg.WSL.SIZE_EPOCH)
        ret["refine_num"] = cfg.WSL.REFINE_NUM
        ret["refine_reg"] = tuple(cfg.WSL.REFINE_REG[: cfg.WSL.REFINE_NUM])
        ret["continuation_on"] = cfg.WSL.CMIL
        ret["box2box_transform"] = Box2BoxTransform(
            weights=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS
        )
        return ret

    @nn.compact
    def __call__(
        self,
        features: Dict[str, Array],
        proposals: Array,
        proposal_scores: Array,
        image_sizes: Array,
        targets: Optional[Dict[str, Array]] = None,
        train: bool = False,
        cur_iter: Optional[Array] = None,
    ):
        feats = [features[f] for f in self.in_features]
        b, r = proposals.shape[:2]
        flat = proposals.reshape(b * r, 4)
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
        pooled = self.pooler(feats, flat, bidx, rois_per_image=r)
        x = DiscriminativeAdaptionNeck(dims=self.dan_dims, dtype=self.dtype, name="dan")(
            pooled, train=train
        )
        cls_logit, det_logit = MILOutputLayers(
            num_classes=self.num_classes, dtype=self.dtype, name="mil"
        )(x)
        cls_logit = cls_logit.reshape(b, r, -1)
        det_logit = det_logit.reshape(b, r, -1)
        valid = jnp.isfinite(proposal_scores)

        lam = (
            roi_merge_lambda(
                cur_iter,
                max(self.max_iter / self.size_epoch, 1.0),
                self.size_epoch,
            )
            if (cur_iter is not None and self.continuation_on)
            else jnp.asarray(1.0)  # lambda=1 -> merging is identity
        )

        def score_one(cl, dl, bx, v):
            # reference fast_rcnn.py:604-634: objectness = per-roi sum of the
            # UNMERGED wsddn scores; merge the raw logits; the final wsddn
            # softmax runs over the merged CLUSTER rows
            obn = wsddn_scores(cl, dl, v).sum(axis=1)
            obn = jnp.where(v, obn, -jnp.inf)  # padding sorts last
            m = roi_merge(obn, pairwise_iou(bx, bx), cl, dl, lam)
            cluster_valid = (
                jnp.zeros(v.shape, bool).at[m["ids"]].max(v) & m["row_valid"]
            )
            cluster_scores = wsddn_scores(
                m["merged_cls"], m["merged_det"], cluster_valid
            )
            return cluster_scores, cluster_scores[m["ids"]]

        cluster_scores, prop_scores = jax.vmap(score_one)(
            cls_logit, det_logit, proposals, valid
        )

        branches = []
        for k in range(self.refine_num):
            with_reg = bool(self.refine_reg[k]) if k < len(self.refine_reg) else False
            logits, deltas = OICROutputLayers(
                num_classes=self.num_classes,
                with_reg=with_reg,
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
            from ..ops import roi_label

            img_labels = jax.vmap(
                lambda c, v: image_level_gt(c, v, self.num_classes)
            )(targets["gt_classes"], targets["gt_valid"])
            losses = {
                "loss_mil": jax.vmap(lambda _m, _l: mil_image_loss(_m, _l, self.mean_loss))(cluster_scores, img_labels).mean()
            }
            # pred_class_img_logits (reference predict_probs_img): class
            # weights CW for ROILabel
            img_preds = jnp.clip(cluster_scores.sum(axis=1), 0.0, 1.0)
            source = prop_scores
            for k, (logits, deltas) in enumerate(branches):
                def one(bx, src, v, lbl, cw, lg, dl):
                    iou = pairwise_iou(bx, bx)
                    # padded rows must not be minable as PGT: roi_label's
                    # per-class argmax sees -inf there (like get_pgt_top_k)
                    src = jnp.where(v[:, None], src, -jnp.inf)
                    rl = roi_label(
                        src,
                        iou,
                        lbl,
                        cw,
                        fg_threshold=0.6,
                        bg_threshold_hi=0.4,
                        bg_threshold_lo=0.1,
                        top_k=1,
                    )
                    w = jnp.where(v, rl["weight"], 0.0)
                    lc = oicr_branch_loss(lg, rl["label"], w)
                    nxt = jax.nn.softmax(lg, -1)[:, : self.num_classes]
                    if dl is None:
                        return lc, jnp.asarray(0.0), nxt
                    from ...ops.losses import smooth_l1_loss

                    t = self.box2box_transform
                    mined = bx[jnp.clip(rl["matched_idx"], 0)]
                    tgt = t.get_deltas(bx, mined)
                    fg_w = w * (rl["label"] < self.num_classes)
                    reg = smooth_l1_loss(dl, tgt, 0.0).sum(-1)
                    lr = jnp.sum(reg * fg_w) / jnp.maximum(jnp.sum(fg_w > 0), 1.0)
                    return lc, lr, nxt

                lc, lr, source = jax.vmap(one)(
                    proposals,
                    jax.lax.stop_gradient(source),
                    valid,
                    img_labels,
                    img_preds,
                    logits,
                    branches[k][1],
                )
                losses[f"loss_refine_cls{k}"] = lc.mean()
                if branches[k][1] is not None:
                    losses[f"loss_refine_reg{k}"] = lr.mean()
            return {}, losses

        # inference: branch-softmax ensemble (reference :471-478); decode
        # the last branch's deltas when it regresses
        if branches:
            avg = sum(
                jax.nn.softmax(l, -1)[..., : self.num_classes] for l, _ in branches
            ) / len(branches)
            final_boxes = proposals
            last_deltas = branches[-1][1]
            if last_deltas is not None:
                final_boxes = self.box2box_transform.apply_deltas(
                    last_deltas.reshape(-1, 4), flat
                ).reshape(b, r, 4)
            scores_out, boxes_out = avg, final_boxes
        else:
            scores_out, boxes_out = prop_scores, proposals

        detections = jax.vmap(
            lambda bx, sc, v, sz: wsl_inference_single(
                bx, sc, v, sz, self.score_thresh_test, self.nms_thresh_test, self.detections_per_image
            )
        )(boxes_out, scores_out, valid, image_sizes)
        return detections, {}


# ---------------------------------------------------------------------------
# CSC: contrastive spatial confidence from CPG maps
# ---------------------------------------------------------------------------


def _round_half_away(x: Array) -> Array:
    """C ``round()``: round half away from zero (numpy/jnp.round is
    half-to-even, which disagrees on *.5 inputs)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def csc(
    cpg: Array,  # (H, W) CPG map for ONE class, normalized so max == 1
    boxes: Array,  # (R, 4) XYXY in image coordinates
    valid: Array,  # (R,) bool; padded rows get W == 1 and are excluded from
    # the per-class score normalization
    label: Array,  # scalar image-level label for this class (>= 0.5: present)
    pred: Array,  # scalar image-level predicted score for this class
    fg_threshold: float = 0.1,
    area_sqrt: bool = True,
    context_scale: float = 1.8,
) -> Array:
    """Reference-exact CSC forward for one class column
    (reference wsl/layers/csrc/csc/csc_cuda.cu:352 ``csc_forward_cuda``):

    1. binarize the CPG map at ``fg_threshold`` and build its integral image
       (``binary_and_integral_cpu``, csc_cuda.cu:131);
    2. per ROI, contrast the binary mass of the *frame* (ROI minus the
       ``1/context_scale``-shrunk inner box) against the *context* (the
       ``context_scale``-grown outer box minus the ROI), each normalized by
       sqrt(area) (``CSCPool``, csc_cuda.cu:184);
    3. normalize the score column to [-1, 1] (positives by the max, negatives
       by |min|; all-zero columns collapse to 1, csc_cuda.cu:488-526);
    4. blend with the image-level prediction:
       ``W = pred * W + (1 - pred)`` (csc_cuda.cu:527-530).

    Absent classes (label < 0.5) keep W == 1 (the ``at::ones`` init,
    csc_cuda.cu:382,412-414). Returns the (R,) weight column."""
    h, w = cpg.shape
    binary = (cpg >= fg_threshold).astype(jnp.float32)
    integral = jnp.cumsum(jnp.cumsum(binary, axis=0), axis=1)

    def box_sum(hs, ws, he, we):
        # inclusive [hs..he, ws..we]; start-1 < 0 contributes 0
        hs = hs.astype(jnp.int32)
        ws = ws.astype(jnp.int32)
        he = he.astype(jnp.int32)
        we = we.astype(jnp.int32)
        a1 = integral[he, we]
        a2 = jnp.where(ws - 1 >= 0, integral[he, jnp.maximum(ws - 1, 0)], 0.0)
        a3 = jnp.where(hs - 1 >= 0, integral[jnp.maximum(hs - 1, 0), we], 0.0)
        a4 = jnp.where(
            (ws - 1 >= 0) & (hs - 1 >= 0),
            integral[jnp.maximum(hs - 1, 0), jnp.maximum(ws - 1, 0)],
            0.0,
        )
        return a1 - a2 - a3 + a4

    def one(box):
        ws = jnp.clip(_round_half_away(box[0]), 0.0, w - 1.0)
        hs = jnp.clip(_round_half_away(box[1]), 0.0, h - 1.0)
        we = jnp.clip(_round_half_away(box[2]), 0.0, w - 1.0)
        he = jnp.clip(_round_half_away(box[3]), 0.0, h - 1.0)

        width_roi = we - ws
        height_roi = he - hs
        w_inner = width_roi / context_scale
        h_inner = height_roi / context_scale
        w_outer = width_roi * context_scale
        h_outer = height_roi * context_scale
        wc = (we + ws) / 2.0
        hc = (he + hs) / 2.0

        ws_i = _round_half_away(wc - w_inner / 2.0)
        hs_i = _round_half_away(hc - h_inner / 2.0)
        we_i = _round_half_away(wc + w_inner / 2.0)
        he_i = _round_half_away(hc + h_inner / 2.0)

        ws_o = _round_half_away(jnp.maximum(wc - w_outer / 2.0, 0.0))
        hs_o = _round_half_away(jnp.maximum(hc - h_outer / 2.0, 0.0))
        we_o = _round_half_away(jnp.minimum(wc + w_outer / 2.0, w - 1.0))
        he_o = _round_half_away(jnp.minimum(hc + h_outer / 2.0, h - 1.0))

        area_roi = (he - hs + 1.0) * (we - ws + 1.0)
        area_inner = (he_i - hs_i + 1.0) * (we_i - ws_i + 1.0)
        area_outer = (he_o - hs_o + 1.0) * (we_o - ws_o + 1.0)
        area_frame = jnp.maximum(area_roi - area_inner, 1.0)
        area_context = jnp.maximum(area_outer - area_roi, 1.0)

        sum_roi = box_sum(hs, ws, he, we)
        sum_inner = box_sum(hs_i, ws_i, he_i, we_i)
        sum_outer = box_sum(hs_o, ws_o, he_o, we_o)
        sum_frame = sum_roi - sum_inner
        sum_context = sum_outer - sum_roi

        if area_sqrt:
            return sum_frame / jnp.sqrt(area_frame) - sum_context / jnp.sqrt(
                area_context
            )
        return sum_frame / area_frame - sum_context / area_context

    scores = jax.vmap(one)(boxes)

    # per-class normalization over valid rows (csc_cuda.cu:488-526): running
    # max/min start at 0, so max >= 0 and min <= 0 by construction
    max_value = jnp.maximum(jnp.max(jnp.where(valid, scores, 0.0)), 0.0)
    min_value = jnp.minimum(jnp.min(jnp.where(valid, scores, 0.0)), 0.0)
    safe_max = jnp.where(max_value > 0, max_value, 1.0)
    safe_min = jnp.where(min_value < 0, -min_value, 1.0)
    normed = jnp.where(
        (max_value > 0) & (min_value < 0),
        jnp.where(scores > 0, scores / safe_max, scores / safe_min),
        jnp.where(max_value > 0, scores / safe_max, 1.0),
    )
    blended = pred * normed + (1.0 - pred)
    w_col = jnp.where(label >= 0.5, blended, 1.0)
    return jnp.where(valid, w_col, 1.0)


def csc_full(
    cpgs: Array,  # (C, H, W) per-class CPG maps, each normalized to max 1
    boxes: Array,  # (R, 4)
    valid: Array,  # (R,)
    labels: Array,  # (C,) image-level multi-hot
    preds: Array,  # (C,) image-level predicted scores
    fg_threshold: float = 0.1,
    area_sqrt: bool = True,
    context_scale: float = 1.8,
) -> Array:
    """All-class CSC weight matrix W (R, C) — the reference op's output
    (csc_cuda.cu:352, `W = _C.csc_forward(...)` in wsl/layers/csc.py:28)."""
    return jax.vmap(
        lambda c, l, p: csc(
            c, boxes, valid, l, p, fg_threshold, area_sqrt, context_scale
        ),
        out_axes=1,
    )(cpgs, labels, preds)


def compute_cpg(apply_fn, variables, batch, class_idx: Array) -> Array:
    """Class peak gradient maps: per-channel-max of |d score_c / d image|,
    normalized so each map's max is 1 (reference roi_heads_csc.py:443
    ``_forward_cpg``: ``cpg.abs_(); torch.max(cpg, dim=1); cpg / max_value``).
    ``apply_fn(variables, batch) -> (B, C) image-level class scores``. The
    reference additionally zeroes maps of classes with pred < tau
    (roi_heads_csc.py:462-463) — callers gate on the prediction."""

    def score(images):
        out = apply_fn(variables, dict(batch, image=images))
        return jnp.sum(
            jnp.take_along_axis(out, class_idx[:, None], axis=1)
        )

    grads = jax.grad(score)(batch["image"])
    cpg = jnp.abs(grads).max(-1)  # (B, H, W) channel max
    return cpg / jnp.maximum(
        cpg.max(axis=(1, 2), keepdims=True), 1e-20
    )


# ---------------------------------------------------------------------------
# UWSOD: unified WSOD with a learned RPN
# ---------------------------------------------------------------------------


@ROI_HEADS_REGISTRY.register()
class UWSODROIHeads(WSDDNROIHeads):
    """Unified WSOD (reference roi_heads_uwsod.py): MIL head + refinement
    with box regression; mined PGT also supervises an RPN (wired by the
    meta-arch through ``pgt_boxes``/``pgt_valid`` in the train aux).
    MRRP branch-folded features are averaged over branches before pooling
    like MRRPOICRROIHeads (reference uwsod_* yamls pair this head with the
    mrrp backbones)."""

    refine_num: int = 3
    # WSL.CLS_AGNOSTIC_BBOX_KNOWN (reference roi_heads_uwsod.py:1292): when
    # True the mined PGT boxes are not attached as regression targets, so
    # the branch deltas regress toward identity
    cls_agnostic_bbox_known: bool = False
    box2box_transform: Optional[Box2BoxTransform] = None
    mrrp_num_branch: int = 1

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape):
        ret = WSDDNROIHeads.from_config(cfg, input_shape)
        ret["refine_num"] = cfg.WSL.REFINE_NUM
        ret["cls_agnostic_bbox_known"] = cfg.WSL.CLS_AGNOSTIC_BBOX_KNOWN
        ret["box2box_transform"] = Box2BoxTransform(
            weights=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS
        )
        ret["mrrp_num_branch"] = (
            cfg.MODEL.MRRP.NUM_BRANCH if cfg.MODEL.MRRP.MRRP_ON else 1
        )
        return ret

    def _prepare_features(self, feats, b):
        if self.mrrp_num_branch <= 1:
            return feats
        return [
            jnp.mean(f.reshape(f.shape[0] // b, b, *f.shape[1:]), axis=0)
            if f.shape[0] > b
            else f
            for f in feats
        ]

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
        from ...ops.losses import smooth_l1_loss

        b, r = proposals.shape[:2]
        feats = self._prepare_features([features[f] for f in self.in_features], b)
        flat = proposals.reshape(b * r, 4)
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
        pooled = self.pooler(feats, flat, bidx, rois_per_image=r)
        x = DiscriminativeAdaptionNeck(dims=self.dan_dims, dtype=self.dtype, name="dan")(
            pooled, train=train
        )
        cls_logit, det_logit = MILOutputLayers(
            num_classes=self.num_classes, dtype=self.dtype, name="mil"
        )(x)
        cls_logit = cls_logit.reshape(b, r, -1)
        det_logit = det_logit.reshape(b, r, -1)
        valid = jnp.isfinite(proposal_scores)
        mil = jax.vmap(wsddn_scores)(cls_logit, det_logit, valid)

        t = self.box2box_transform or Box2BoxTransform(weights=(10.0, 10.0, 5.0, 5.0))
        branches = []
        for k in range(self.refine_num):
            logits, deltas = OICROutputLayers(
                num_classes=self.num_classes, with_reg=True, dtype=self.dtype, name=f"refine{k}"
            )(x)
            branches.append((logits.reshape(b, r, -1), deltas.reshape(b, r, -1)))

        if train:
            img_labels = jax.vmap(
                lambda c, v: image_level_gt(c, v, self.num_classes)
            )(targets["gt_classes"], targets["gt_valid"])
            losses = {"loss_mil": jax.vmap(lambda _m, _l: mil_image_loss(_m, _l, self.mean_loss))(mil, img_labels).mean()}
            source = mil
            pgt_boxes_out = None
            pgt_valid_out = None
            for k, (logits, deltas) in enumerate(branches):
                def one(bx, src, v, lbl, lg, dl):
                    pgt = get_pgt_top_k(bx, src, v, lbl, top_k=1)
                    sup = label_proposals_by_pgt(bx, v, pgt, self.num_classes)
                    lc = oicr_branch_loss(lg, sup["labels"], sup["weights"])
                    if self.cls_agnostic_bbox_known:
                        tgt = jnp.zeros_like(dl)  # regress to the proposal itself
                    else:
                        tgt = t.get_deltas(bx, sup["matched_pgt_boxes"])
                    reg = smooth_l1_loss(dl, tgt, 0.0).sum(-1)
                    fg_w = sup["weights"] * sup["fg"]
                    lr = jnp.sum(reg * fg_w) / jnp.maximum(jnp.sum(fg_w > 0), 1.0)
                    nxt = jax.nn.softmax(lg, -1)[:, : self.num_classes]
                    return lc, lr, nxt, pgt["boxes"][:, 0], pgt["valid"][:, 0]

                lc, lr, source, pb, pv = jax.vmap(one)(
                    proposals, jax.lax.stop_gradient(source), valid, img_labels, logits, deltas
                )
                losses[f"loss_refine_cls{k}"] = lc.mean()
                losses[f"loss_refine_reg{k}"] = lr.mean()
                pgt_boxes_out, pgt_valid_out = pb, pv
            aux = {"pgt_boxes": pgt_boxes_out, "pgt_valid": pgt_valid_out}
            return aux, losses

        avg = sum(
            jax.nn.softmax(l, -1)[..., : self.num_classes] for l, _ in branches
        ) / max(self.refine_num, 1)
        last_deltas = branches[-1][1]
        dec = t.apply_deltas(last_deltas.reshape(-1, 4), flat).reshape(b, r, 4)
        detections = jax.vmap(
            lambda bx, sc, v, sz: wsl_inference_single(
                bx, sc, v, sz, self.score_thresh_test, self.nms_thresh_test, self.detections_per_image
            )
        )(dec, avg, valid, image_sizes)
        return detections, {}
