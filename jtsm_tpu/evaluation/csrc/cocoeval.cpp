// Fast COCO evaluation matcher (native path).
//
// Reference: detectron2/layers/csrc/cocoeval/cocoeval.cpp (~500 LoC, pybind)
// — a C++ reimplementation of pycocotools' evaluateImages that is ~10x
// faster. This version exposes a plain C ABI (loaded via ctypes; pybind11 is
// not available in this image) and batches every (image, category) pair of
// the dataset into one call.
//
// Semantics implemented (the COCO protocol):
//   * per IoU threshold, greedily match detections (pre-sorted by score
//     descending) to ground truths;
//   * gts are pre-sorted: non-ignored first; crowd gts can be matched many
//     times; a real match is preferred over an ignored one;
//   * matched-to-ignored detections are marked ignored;
//   * unmatched detections outside the area range are ignored.

#include <cstdint>
#include <cstring>

extern "C" {

// Arrays are flat over all (img, cat) pairs, with per-pair offsets:
//   num_pairs            : P
//   det_offsets[P+1]     : detection ranges per pair
//   gt_offsets[P+1]      : gt ranges per pair
//   ious                 : flat row-major (D_p x G_p) blocks, one per pair,
//                          laid out at iou_offsets[p]
//   gt_ignore            : per gt (sorted order), 1 if ignored for this area
//   gt_crowd             : per gt, 1 if iscrowd
//   det_out_of_range     : per det, 1 if det area outside range
//   thresholds[T]
// Outputs (caller-allocated, zero-initialized):
//   det_matched  (T x D_total) uint8
//   det_ignore   (T x D_total) uint8
void cocoeval_match(
    int64_t num_pairs,
    const int64_t* det_offsets,
    const int64_t* gt_offsets,
    const int64_t* iou_offsets,
    const double* ious,
    const uint8_t* gt_ignore,
    const uint8_t* gt_crowd,
    const uint8_t* det_out_of_range,
    const double* thresholds,
    int64_t num_thresholds,
    int64_t det_total,
    uint8_t* det_matched,
    uint8_t* det_ignore) {
  // scratch for gt_used flags
  for (int64_t p = 0; p < num_pairs; ++p) {
    const int64_t d0 = det_offsets[p], d1 = det_offsets[p + 1];
    const int64_t g0 = gt_offsets[p], g1 = gt_offsets[p + 1];
    const int64_t D = d1 - d0, G = g1 - g0;
    const double* iou = ious + iou_offsets[p];

    for (int64_t t = 0; t < num_thresholds; ++t) {
      const double thr = thresholds[t];
      // per-pair, per-threshold gt used flags (stack buffer for small G)
      uint8_t used_stack[512];
      uint8_t* used = used_stack;
      bool heap = false;
      if (G > 512) {
        used = new uint8_t[G];
        heap = true;
      }
      std::memset(used, 0, G);

      for (int64_t d = 0; d < D; ++d) {
        double best_iou = thr < 1.0 - 1e-10 ? thr : 1.0 - 1e-10;
        int64_t best_g = -1;
        for (int64_t g = 0; g < G; ++g) {
          if (used[g] && !gt_crowd[g0 + g]) continue;
          // once matched to a real gt, stop at the first ignored gt
          if (best_g > -1 && !gt_ignore[g0 + best_g] && gt_ignore[g0 + g]) break;
          const double v = iou[d * G + g];
          if (v < best_iou) continue;
          best_iou = v;
          best_g = g;
        }
        if (best_g == -1) continue;
        used[best_g] = 1;
        det_matched[t * det_total + d0 + d] = 1;
        det_ignore[t * det_total + d0 + d] = gt_ignore[g0 + best_g];
      }
      // unmatched dets out of area range are ignored
      for (int64_t d = 0; d < D; ++d) {
        const int64_t idx = t * det_total + d0 + d;
        if (!det_matched[idx] && det_out_of_range[d0 + d]) det_ignore[idx] = 1;
      }
      if (heap) delete[] used;
    }
  }
}

// Box IoU for one (img, cat) pair set: XYWH boxes, crowd semantics.
void cocoeval_box_iou(
    const double* dets,  // (D, 4) xywh
    const double* gts,   // (G, 4) xywh
    const uint8_t* crowd,
    int64_t D,
    int64_t G,
    double* out) {  // (D, G)
  for (int64_t d = 0; d < D; ++d) {
    const double dx0 = dets[d * 4], dy0 = dets[d * 4 + 1];
    const double dw = dets[d * 4 + 2], dh = dets[d * 4 + 3];
    const double dx1 = dx0 + dw, dy1 = dy0 + dh;
    const double da = dw * dh;
    for (int64_t g = 0; g < G; ++g) {
      const double gx0 = gts[g * 4], gy0 = gts[g * 4 + 1];
      const double gw = gts[g * 4 + 2], gh = gts[g * 4 + 3];
      const double gx1 = gx0 + gw, gy1 = gy0 + gh;
      const double iw = (dx1 < gx1 ? dx1 : gx1) - (dx0 > gx0 ? dx0 : gx0);
      const double ih = (dy1 < gy1 ? dy1 : gy1) - (dy0 > gy0 ? dy0 : gy0);
      double v = 0.0;
      if (iw > 0 && ih > 0) {
        const double inter = iw * ih;
        const double uni = crowd[g] ? da : da + gw * gh - inter;
        if (uni > 0) v = inter / uni;
      }
      out[d * G + g] = v;
    }
  }
}

}  // extern "C"
