"""JTSMROIHeads — joint thing-and-stuff mining (reference:
projects/WSL/wsl/modeling/roi_heads/roi_heads_jtsm.py:198).

Key machinery mapped to static shapes:
* MOIPool superpixel-masked pooling + mask-area rescale (:608-630)
* joint thing+stuff MIL via TSM scoring (fast_rcnn_tsm.py:490-586)
* K OICR refinement branches on mined top-k or MIST PGT (:678-686, :1038,
  :1168); ``WSL.REFINE_MIST`` selects MIST with a 3x weight on branch 0
* mask PGT mining: top-1 per present class + ``WSL.MASK_MINED_TOP_K``
  IoU-nearest foreground neighbors, each with object evidence (:843-916);
  evidence is the superpixel union (:1924) or host-side GrabCut (:1820,
  ``WSL.OBJECT_EVIDENCE = "grabcut"`` via ``jax.pure_callback``)
* self-training mask refinery (:449 builds the heads, :936-946 trains
  them on the previous head's thresholded predictions via ``get_pgt_mask``
  :1997); inference averages the refinery logits (:952-965)
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
from .. import ops as wsl_ops
from ..ops import moi_pool
from ...structures.boxes import pairwise_iou
from .mil_heads import (
    MILOutputLayers,
    OICROutputLayers,
    get_pgt_mist,
    get_pgt_top_k,
    label_proposals_by_pgt,
    mil_image_loss,
    oicr_branch_loss_terms,
    oicr_reg_loss_sum,
    wsddn_scores,
)
from .roi_heads_wsl import (
    DiscriminativeAdaptionNeck,
    image_level_gt,
    image_level_gt_stuff,
    wsl_inference_single,
)

Array = jax.Array


def _mask_logits(head, x):
    """WSL mask heads return (logits, trunk features) (reference
    mask_head.py:339 ``layers()``); the core head returns logits alone."""
    out = head(x)
    return out[0] if isinstance(out, tuple) else out


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


def superpixel_union_mask_crops(
    superpixels: Array,  # (Hs, Ws) int32
    oh_sel: Array,  # (D, S) membership rows of the mined proposals
    boxes: Array,  # (D, 4)
    mask_size: int,
    grid_stride: int = 4,
) -> Array:
    """Batched ``superpixel_union_mask_crop`` with the superpixel map read on
    a stride-g cell grid: the membership image is a one-hot segment matmul
    and the per-bin lookups are separable one-hot batched matmuls (see
    wsl/ops.superpixel_membership_grid) instead of ~12-cycle/element XLA
    scalar gathers. grid_stride <= 1 falls back to the exact per-pixel crop."""
    if grid_stride <= 1:
        return jax.vmap(
            lambda oh_j, bb_j: superpixel_union_mask_crop(
                superpixels, oh_j, bb_j, mask_size
            )
        )(oh_sel, boxes)
    hs, ws = superpixels.shape
    g = int(grid_stride)
    mask_g = wsl_ops.superpixel_membership_grid(superpixels, oh_sel, g)
    centers = (jnp.arange(mask_size) + 0.5) / mask_size
    ys = jnp.clip(
        (boxes[:, 1:2] + centers[None, :] * (boxes[:, 3:4] - boxes[:, 1:2])).astype(
            jnp.int32
        ),
        0,
        hs - 1,
    )
    xs = jnp.clip(
        (boxes[:, 0:1] + centers[None, :] * (boxes[:, 2:3] - boxes[:, 0:1])).astype(
            jnp.int32
        ),
        0,
        ws - 1,
    )
    member = wsl_ops.sample_membership_grid(mask_g, ys // g, xs // g)
    return member >= 0.5


@ROI_HEADS_REGISTRY.register()
class JTSMROIHeads(nn.Module):
    num_classes: int  # things
    num_classes_stuff: int  # stuff classes incl. class 0 = "things"
    in_features: Sequence[str]
    pooler: ROIPooler
    refine_num: int = 4
    refine_reg: Sequence[bool] = (True, True, True, True)
    refine_mist: bool = False  # MIST mining for the refine branches (:682)
    dan_dims: Sequence[int] = (4096, 4096)
    dan_dropout: float = 0.5  # reference box_head.py:66 fc dropout
    box2box_transform: Optional[Box2BoxTransform] = None
    sp_on: bool = True
    sp_grid_stride: int = 4  # MOIPool membership grid (see wsl/ops.moi_pool)
    moi_pool_exact: bool = False  # reference-exact rank-compacted MOIPool
    moi_nonneg: bool = True  # pooled features ReLU-nonneg -> multiply mask
    ps_on: bool = True
    use_obn: bool = True
    mask_on: bool = True
    mask_head: Optional[nn.Module] = None  # class-agnostic base head (:440)
    mask_refinery: Sequence[nn.Module] = ()  # class-specific refinery (:449)
    mask_pooler: Optional[ROIPooler] = None
    mask_mined_top_k: int = 10  # IoU-nearest neighbors per mined pgt (:843)
    mask_size: int = 28
    mask_capacity: int = 64  # mined mask rois per image (static)
    object_evidence_mode: str = "superpixel"  # or "grabcut" (:1820)
    test_no_paste: bool = False  # emit full-image superpixel masks (:969)
    pgt_stride: int = 1  # paint pgt_sem_seg at the seg head's stride
    score_thresh_test: float = 1e-4
    nms_thresh_test: float = 0.4
    detections_per_image: int = 100
    sem_seg_ignore: int = 255
    mean_loss: bool = True  # WSL.MEAN_LOSS (reference fast_rcnn_tsm.py:355)
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
            refine_mist=cfg.WSL.REFINE_MIST,
            dan_dims=tuple(cfg.MODEL.ROI_BOX_HEAD.DAN_DIM),
            box2box_transform=Box2BoxTransform(
                weights=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS
            ),
            sp_on=cfg.WSL.SP_ON,
            sp_grid_stride=cfg.WSL.SP_GRID_STRIDE,
            moi_pool_exact=cfg.WSL.MOI_POOL_EXACT,
            moi_nonneg=cfg.WSL.MOI_NONNEG_FEATURES,
            ps_on=cfg.WSL.PS_ON,
            use_obn=cfg.WSL.USE_OBN,
            mask_on=cfg.MODEL.MASK_ON,
            mask_mined_top_k=cfg.WSL.MASK_MINED_TOP_K,
            mask_capacity=cfg.WSL.MASK_CAPACITY,
            object_evidence_mode=cfg.WSL.OBJECT_EVIDENCE,
            test_no_paste=cfg.WSL.TEST_NO_PASTE,
            # mined pseudo sem-seg is consumed by the seg head at its
            # common stride; paint directly at that resolution
            pgt_stride=cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE if cfg.WSL.PS_ON else 1,
            score_thresh_test=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            nms_thresh_test=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            sem_seg_ignore=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            mean_loss=cfg.WSL.MEAN_LOSS,
            dtype=dtype,
        )
        if cfg.MODEL.MASK_ON:
            mask_res = cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION
            shape = ShapeSpec(
                channels=input_shape[in_features[0]].channels,
                height=mask_res,
                width=mask_res,
            )
            # reference :440-460: the BASE head is forced class-agnostic;
            # the refinery heads keep the config's class-specific setting
            cfg_base = cfg.clone()
            cfg_base.defrost()
            cfg_base.MODEL.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK = True
            ret["mask_head"] = build_mask_head(cfg_base, shape)
            ret["mask_refinery"] = tuple(
                build_mask_head(cfg, shape) for _ in range(cfg.WSL.MASK_REFINE_NUM)
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
        images: Optional[Array] = None,  # (B, H, W, 3) raw, for GrabCut
    ):
        # multi-level FPN features route through the standard ROIPooler; the
        # superpixel MOIPool path operates on the finest configured level
        # (the flagship DC5 configs are single-level, matching the reference)
        feats = [features[f] for f in self.in_features]
        feat = feats[0]  # (B, Hf, Wf, C)
        b, r = proposals.shape[:2]
        spatial_scale = self.pooler.scales[0]
        p = self.pooler.output_size[0]

        valid = jnp.isfinite(proposal_scores)

        if self.sp_on and superpixels is not None and oh_labels is not None:
            if self.moi_pool_exact:
                # reference-exact rank-compacted binning (MOIPool_cuda.cu;
                # pinned in tests/test_wsl_parity.py) — fidelity mode
                from ..ops import moi_pool_exact

                pooled, valid_bins = jax.vmap(
                    lambda f, bx, sp, oh: moi_pool_exact(
                        f, bx, sp, oh, spatial_scale, p
                    )
                )(feat, proposals, superpixels, oh_labels)
                valid_frac = valid_bins.astype(jnp.float32)
            else:
                pooled, valid_frac = jax.vmap(
                    lambda f, bx, sp, oh: moi_pool(
                        f,
                        bx,
                        sp,
                        oh,
                        spatial_scale,
                        p,
                        self.pooler.sampling_ratio,
                        sp_grid_stride=self.sp_grid_stride,
                        nonneg_features=self.moi_nonneg,
                    )
                )(feat, proposals, superpixels, oh_labels)
            pooled = pooled.reshape(b * r, p, p, -1)
            # bins with any member-superpixel coverage (argmax != -1 in the
            # reference kernel)
            nonempty = jnp.sum(valid_frac > 0, axis=(2, 3)).astype(jnp.float32)
        else:
            # no superpixels: plain RoIPool (the MOIPool kernel family's
            # max-pool semantics without masking; reference MOIPool_cpu.cpp)
            from ..ops import roi_pool

            pooled, valid_bins = jax.vmap(
                lambda f, bx: roi_pool(f, bx, spatial_scale, p)
            )(feat, proposals)
            pooled = pooled.reshape(b * r, p, p, -1)
            nonempty = jnp.sum(valid_bins, axis=(2, 3)).astype(jnp.float32)

        # mask-area rescale + objectness scaling (reference :608-633): the
        # pooled features are MULTIPLIED by P^2/(nonempty_bins + 1) and by
        # (objectness + 1) before the box head
        mask_scale = (p * p) / (nonempty + 1.0)  # (B, R)
        feat_scale = mask_scale
        if self.use_obn:
            obj = jnp.where(valid, proposal_scores, 0.0)
            feat_scale = feat_scale * (obj + 1.0)
        pooled = pooled * feat_scale.reshape(b * r, 1, 1, 1).astype(pooled.dtype)

        x = DiscriminativeAdaptionNeck(
            dims=self.dan_dims, dropout=self.dan_dropout, dtype=self.dtype, name="dan"
        )(pooled, train=train)
        cls_logit, det_logit = MILOutputLayers(
            num_classes=self.joint_classes, dtype=self.dtype, name="mil"
        )(x)
        cls_logit = cls_logit.reshape(b, r, -1)
        det_logit = det_logit.reshape(b, r, -1)

        mil = jax.vmap(wsddn_scores)(cls_logit, det_logit, valid)  # (B, R, Cj)

        # refinement branches are (things + 1)-way with class-specific
        # regression (reference _init_box_head :384 OICROutputLayers over
        # ROI_HEADS.NUM_CLASSES, fast_rcnn_oicr.py:488)
        branches = []
        for k in range(self.refine_num):
            logits, deltas = OICROutputLayers(
                num_classes=self.num_classes,
                with_reg=self.refine_reg[k] if k < len(self.refine_reg) else False,
                reg_classes=self.num_classes,
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
                proposals, valid, mil, branches, targets, superpixels, oh_labels, b, r, feats, images
            )
        return self._inference(
            proposals, valid, mil, branches, image_sizes, feats, b, r, superpixels, oh_labels
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

    def _losses(
        self, proposals, valid, mil, branches, targets, superpixels, oh_labels, b, r, feats, images=None
    ):
        ct = self.num_classes
        img_labels = self._joint_labels(targets, b)
        losses = {
            "loss_mil": jax.vmap(
                lambda m, l: mil_image_loss(m, l, self.mean_loss)
            )(mil, img_labels).mean()
        }
        # image-level class probabilities: the supervision weights of every
        # top-k mining step (reference predict_probs_img fast_rcnn_tsm.py:840
        # feeding get_pgt_top_k's need_weight path :1263)
        img_probs = jnp.clip(mil.sum(axis=1), 1e-6, 1.0 - 1e-6)  # (B, Cj)
        n_prop = jnp.maximum(jnp.sum(valid), 1.0)  # real proposals in batch

        # refinement cascade over THING classes (reference :678-724 mines
        # with self.num_classes/gt_classes_img_int — stuff is MIL-only)
        source = mil[:, :, :ct]
        src_boxes = proposals  # (B, R, 4), per-class (B, R, Ct, 4) after reg
        for k, (logits, deltas) in enumerate(branches):
            has_reg = deltas is not None
            deltas_in = deltas if has_reg else jnp.zeros((b, r, 4 * ct))

            def mine_and_terms(bx, sbx, src, v, lbl, imgw, lg, dl, has_reg=has_reg):
                if self.refine_mist:
                    # MIST (:682): top-15% + cross-class NMS diversification
                    pgt = get_pgt_mist(sbx, src, v, lbl)
                else:
                    pgt = get_pgt_top_k(
                        sbx, src, v, lbl, top_k=1, img_weights=imgw
                    )
                sup = label_proposals_by_pgt(bx, v, pgt, ct)
                cls_sum, cls_cnt = oicr_branch_loss_terms(
                    lg, sup["labels"], sup["weights"]
                )
                if has_reg:
                    reg_sum = oicr_reg_loss_sum(
                        dl,
                        sup["labels"],
                        sup["weights"],
                        sup["fg"],
                        bx,
                        sup["matched_pgt_boxes"],
                        self.box2box_transform,
                    )
                    nxt_boxes = self.box2box_transform.apply_deltas(
                        dl.reshape(-1, 4),
                        jnp.broadcast_to(bx[:, None, :], (bx.shape[0], ct, 4)).reshape(-1, 4),
                    ).reshape(bx.shape[0], ct, 4)
                else:
                    reg_sum = jnp.asarray(0.0)
                    nxt_boxes = bx
                nxt = jax.nn.softmax(lg, axis=-1)[:, :ct]
                return cls_sum, cls_cnt, reg_sum, nxt, nxt_boxes

            cls_sum, cls_cnt, reg_sum, source, src_boxes = jax.vmap(mine_and_terms)(
                proposals,
                jax.lax.stop_gradient(src_boxes),
                jax.lax.stop_gradient(source),
                valid,
                img_labels[:, :ct],
                img_probs[:, :ct],
                branches[k][0],
                deltas_in,
            )
            # reference :681-686: under MIST, branch 0 is up-weighted 3x
            term_weight = 3.0 if (self.refine_mist and k == 0) else 1.0
            # batch-level normalizers (fast_rcnn_oicr.py:297 / :378)
            losses[f"loss_refine_cls{k}"] = (
                cls_sum.sum() / jnp.maximum(cls_cnt.sum(), 1.0) * term_weight
            )
            if has_reg:
                losses[f"loss_refine_reg{k}"] = reg_sum.sum() / n_prop * term_weight

        aux = {}
        if self.ps_on and superpixels is not None:
            # paint at the seg head's stride: the head immediately strides
            # full-res targets, so the full-res per-pixel gather was 16x
            # wasted work (18 ms of the step at 480x864 batch 4).
            # Mined from the MIL scores (reference :673-677 runs
            # get_pgt_sem_seg on predictions[0], BEFORE the refinement loop)
            aux["pgt_sem_seg"] = self._mine_sem_seg(
                proposals,
                valid,
                jax.lax.stop_gradient(mil),
                img_labels,
                superpixels[:, :: self.pgt_stride, :: self.pgt_stride],
                oh_labels,
            )
            aux["pgt_sem_seg_stride"] = self.pgt_stride
        if self.mask_on and superpixels is not None:
            losses.update(
                self._mask_losses(
                    proposals,
                    valid,
                    jax.lax.stop_gradient(source),
                    img_labels,
                    superpixels,
                    oh_labels,
                    feats,
                    b,
                    r,
                    images,
                    img_probs=img_probs,
                    src_boxes=jax.lax.stop_gradient(src_boxes),
                )
            )
        return aux, losses

    def _mine_sem_seg(self, proposals, valid, mil, img_labels, superpixels, oh_labels):
        """Paint mined top-1 masks into a per-pixel pseudo sem-seg label map
        (reference get_pgt_sem_seg :2025): only the present STUFF classes are
        mined (the reference mines gt_classes_img_int_stuff; things are never
        painted, so the canvas keeps 0 = "things" elsewhere — its `== 0 ->
        255` ignore conversion is commented out upstream). Masks are painted
        in ASCENDING mined-score order so the highest-score class wins each
        pixel, then any present class whose value got fully painted over is
        force-painted back (:2066-2068).

        Object evidence is the proposal's superpixel union rather than the
        reference's host GrabCut (get_grabcut_process :1820 via
        object_evidence :1924) — the deliberate TPU-side redesign; GrabCut
        evidence remains available for the mask branch via
        WSL.OBJECT_EVIDENCE."""
        ct = self.num_classes
        cs = self.num_classes_stuff - 1  # stuff classes (excl. 0 = things)

        def one(bx, v, sc, lbl, sp, oh):
            pgt = get_pgt_top_k(bx, sc[:, ct:], v, lbl[ct:], top_k=1)
            ridx = pgt["idx"][:, 0]  # (Cs,)
            present = pgt["valid"][:, 0]  # (Cs,)
            score = pgt["score"][:, 0]  # (Cs,) mined score (ranking key)
            # the painted label is constant WITHIN a superpixel, so resolve
            # the winning class in superpixel space (Cs x S table) and gather
            # per pixel ONCE. (A per-(class, pixel) gather was 72% of the
            # JTSM train step, 432 ms at batch 4.)
            ohc = oh[ridx]  # (Cs, S)
            covers = ohc & present[:, None]  # (Cs, S)
            # highest mined score wins (reference paints score-ascending)
            w_sp = jnp.where(covers, score[:, None], -jnp.inf)  # (Cs, S)
            win = jnp.argmax(w_sp, axis=0)  # (S,)
            any_sp = covers.any(axis=0)  # (S,)
            paint_vals = jnp.arange(1, cs + 1, dtype=jnp.int32)
            out_sp = jnp.where(any_sp, paint_vals[win], 0)  # (S,) 0 = things
            # force-missing pass: paint a present class's mask over the
            # canvas if its value vanished entirely
            for c in range(cs):
                absent = ~jnp.any(out_sp == c + 1)
                out_sp = jnp.where(absent & covers[c], c + 1, out_sp)
            return out_sp[sp]  # (hs, ws): one per-pixel gather

        return jax.vmap(one)(proposals, valid, mil, img_labels, superpixels, oh_labels)

    def _mask_losses(
        self, proposals, valid, scores, img_labels, superpixels, oh_labels, feats, b, r,
        images=None, img_probs=None, src_boxes=None,
    ):
        """Mask PGT mining + base head + self-training refinery (reference
        _forward_mask :754-946).

        1. Mine top-1 pgt per present thing class, then its
           ``mask_mined_top_k`` IoU-nearest valid proposals (:843-852); each
           neighbor is a mask-training roi carrying the pgt class.
        2. Object evidence per roi (:1820/:1924): superpixel union of the
           roi's member superpixels, or host-side GrabCut on its box.
        3. Class-agnostic base head trains on the evidence; each refinery
           head k trains on the PREVIOUS head's thresholded predictions
           (``get_pgt_mask`` :1997 — pasting then re-cropping at the same
           box is identity in crop space, so we stay at ``mask_size``).

        Static shapes: candidates are (Ct * K) per image, ranked by pgt
        weight and capped at ``mask_capacity`` (the cap drops lowest-weight
        neighbors when Ct * K exceeds it).
        """
        from ...modeling.roi_heads.mask_head import mask_rcnn_inference, mask_rcnn_loss

        ct = self.num_classes
        k_nn = max(1, min(self.mask_mined_top_k, r))
        cm = min(self.mask_capacity, ct * k_nn)
        if img_probs is None:
            img_probs = jnp.ones((b, scores.shape[-1]))
        if src_boxes is None:
            src_boxes = proposals

        def mine(bx, sbx, v, sc, lbl, imgw):
            thing_scores = sc[:, :ct]
            # mined from the LAST refinement branch's scores/boxes with the
            # image-logit weights (reference _forward_mask :821-828 mines
            # prev_pred_boxes/prev_pred_scores with need_weight=True)
            pgt = get_pgt_top_k(
                sbx, thing_scores, v, lbl[:ct], top_k=1, img_weights=imgw[:ct]
            )
            pboxes = pgt["boxes"][:, 0]  # (Ct, 4)
            pvalid = pgt["valid"][:, 0] & (pgt["weight"][:, 0] > 0)
            pw = pgt["weight"][:, 0]
            # IoU-nearest neighbors among valid proposals (:843-852); the
            # pgt proposal itself is neighbor 0 (IoU 1), covering the
            # reference's separate top-1 targets pass
            iou = pairwise_iou(pboxes, bx)  # (Ct, R)
            iou = jnp.where(v[None, :], iou, -1.0)
            nbr_iou, nbr_idx = jax.lax.top_k(iou, k_nn)  # (Ct, K)
            # fg gate mirrors label_and_sample_proposals (matcher IoU >= .5)
            cand_ok = pvalid[:, None] & (nbr_iou >= 0.5)
            cand_w = jnp.where(cand_ok, pw[:, None], 0.0).reshape(ct * k_nn)
            topw, sel = jax.lax.top_k(cand_w, cm)  # capacity cap
            ridx = nbr_idx.reshape(ct * k_nn)[sel]
            cls = (
                jnp.broadcast_to(jnp.arange(ct)[:, None], (ct, k_nn))
                .reshape(ct * k_nn)[sel]
            )
            ok = cand_ok.reshape(ct * k_nn)[sel] & (topw > 0)
            return bx[ridx], cls, ok, ridx, topw

        boxes, cls, ok, ridx, weights = jax.vmap(mine)(
            proposals, src_boxes, valid, scores, img_labels, img_probs
        )

        if self.object_evidence_mode == "grabcut" and images is not None:
            # host-side GrabCut per mined box (reference get_grabcut :1820),
            # seeded with the box; runs between steps via pure_callback
            from ..evidence import grabcut_evidence_batch

            def _host(img, bx, okk):
                import numpy as np

                return grabcut_evidence_batch(
                    np.asarray(img)[..., ::-1],  # RGB -> BGR for cv2
                    np.asarray(bx),
                    np.asarray(okk),
                    self.mask_size,
                )

            mask_targets = jax.pure_callback(
                _host,
                jax.ShapeDtypeStruct((b, cm, self.mask_size, self.mask_size), jnp.bool_),
                images,
                boxes,
                ok,
            )
        else:
            mask_targets = jax.vmap(
                lambda sp, oh, rid, bb: superpixel_union_mask_crops(
                    sp, oh[rid], bb, self.mask_size, self.sp_grid_stride
                )
            )(superpixels, oh_labels, ridx, boxes)

        flat_boxes = boxes.reshape(b * cm, 4)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), cm)
        mask_feats = self.mask_pooler(feats, flat_boxes, batch_idx, rois_per_image=cm)
        flat_cls = cls.reshape(-1)
        flat_ok = ok.reshape(-1)
        flat_targets = mask_targets.reshape(
            b * cm, self.mask_size, self.mask_size
        ).astype(jnp.float32)

        mask_logits = _mask_logits(self.mask_head, mask_feats)
        losses = {
            "loss_mask": mask_rcnn_loss(mask_logits, flat_cls, flat_targets, flat_ok)
        }
        prev_logits = mask_logits
        for kk, head in enumerate(self.mask_refinery):
            # self-target: previous head's prediction at the roi's class,
            # thresholded at 0.5 (get_pgt_mask :1997)
            self_t = mask_rcnn_inference(
                jax.lax.stop_gradient(prev_logits), flat_cls
            )
            logits_k = _mask_logits(head, mask_feats)
            losses[f"loss_mask_r{kk}"] = mask_rcnn_loss(
                logits_k, flat_cls, (self_t >= 0.5).astype(jnp.float32), flat_ok
            )
            prev_logits = logits_k
        return losses

    def _inference(
        self, proposals, valid, mil, branches, image_sizes, feats, b, r,
        superpixels=None, oh_labels=None,
    ):
        ct = self.num_classes
        # ensemble over the refinement branches: softmax probs averaged and
        # the class-specific deltas averaged before ONE decode (reference
        # OICROutputLayers.inference with predictions_K ->
        # predict_probs_K / predict_boxes_K, fast_rcnn_oicr.py:712-786)
        avg = jnp.zeros((b, r, ct))
        for logits, _ in branches:
            avg = avg + jax.nn.softmax(logits, axis=-1)[..., :ct]
        avg = avg / max(self.refine_num, 1)

        final_boxes = proposals
        reg_deltas = [d for _, d in branches if d is not None]
        if reg_deltas:
            mean_deltas = sum(reg_deltas) / len(reg_deltas)  # (B, R, Ct*4)
            final_boxes = self.box2box_transform.apply_deltas(
                mean_deltas.reshape(-1, 4),
                jnp.broadcast_to(
                    proposals[:, :, None, :], (b, r, ct, 4)
                ).reshape(-1, 4),
            ).reshape(b, r, ct, 4)

        thing_scores = avg
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

        if (
            self.test_no_paste
            and self.sp_on
            and superpixels is not None
            and oh_labels is not None
        ):
            # full-image superpixel-union instance masks + no_paste flags
            # (reference roi_heads_jtsm.py:969-997 / postprocessing.py:63-70):
            # each detection's mask is the union of its SOURCE proposal's
            # member superpixels at image resolution
            def paint(sp, oh, pidx):
                return oh[pidx][:, sp]  # (D, Hs, Ws) via per-det gather

            detections["masks_full"] = jax.vmap(paint)(
                superpixels, oh_labels, detections["prop_idx"]
            )
            detections["no_paste"] = detections["valid"]
            return detections, {}

        if self.mask_on and self.mask_head is not None:
            detections["masks"] = self._mask_probs(
                feats, detections["boxes"], detections["classes"], b
            )
        return detections, {}

    def _mask_probs(self, feats, boxes, classes, b):
        """Per-detection mask probabilities from the refinery ensemble
        (reference :952-960: inference averages the REFINERY heads' logits;
        the class-agnostic base head only seeds training)."""
        d = boxes.shape[1]
        det_boxes = boxes.reshape(b * d, 4)
        det_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
        mask_feats = self.mask_pooler(feats, det_boxes, det_batch, rois_per_image=d)
        if self.mask_refinery:
            mask_logits = _mask_logits(self.mask_refinery[0], mask_feats)
            for head in self.mask_refinery[1:]:
                mask_logits = mask_logits + _mask_logits(head, mask_feats)
            mask_logits = mask_logits / len(self.mask_refinery)
        else:
            mask_logits = _mask_logits(self.mask_head, mask_feats)
        probs = mask_rcnn_inference(mask_logits, classes.reshape(-1))
        return probs.reshape(b, d, probs.shape[-2], probs.shape[-1])

    def forward_with_given_boxes(self, features, detections):
        """Run only the mask branch on externally provided detections
        (TTA mask re-run on merged boxes, reference
        test_time_augmentation_avg.py:405-428)."""
        feats = [features[f] for f in self.in_features]
        b = detections["boxes"].shape[0]
        if self.mask_on and self.mask_head is not None:
            detections = dict(detections)
            detections["masks"] = self._mask_probs(
                feats, detections["boxes"], detections["classes"], b
            )
        return detections
