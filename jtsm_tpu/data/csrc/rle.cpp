// Native COCO RLE mask ops (C ABI, built on demand via g++ — see
// jtsm_tpu/data/rle_native.py).
//
// Reference parity: pycocotools' maskApi.c (rleFrString / rleIou / rleArea),
// which detectron2's segmentation evaluation rides. Pair IoU runs directly
// on run-length counts — no full-image decode — making segm mAP evaluation
// O(runs) per pair instead of O(H*W).

#include <algorithm>
#include <cstdint>

extern "C" {

// LEB128-ish COCO string -> counts. Returns #runs, or -1 if it would
// exceed max_counts.
int64_t rle_decode_string(const char* s, int64_t slen, int64_t* counts,
                          int64_t max_counts) {
  int64_t n = 0;
  int64_t i = 0;
  while (i < slen) {
    long long x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      if (i >= slen) return -1;
      int c = s[i] - 48;
      x |= (long long)(c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      ++k;
      if (!more && (c & 0x10)) x |= -1LL << (5 * k);
    }
    if (n > 2) x += counts[n - 2];
    if (n >= max_counts) return -1;
    counts[n++] = (int64_t)x;
  }
  return n;
}

// Sum of 1-runs (odd indices).
int64_t rle_area(const int64_t* counts, int64_t n) {
  int64_t a = 0;
  for (int64_t i = 1; i < n; i += 2) a += counts[i];
  return a;
}

// Intersection of two run-length masks by merging runs.
static int64_t rle_intersection(const int64_t* a, int64_t an, const int64_t* b,
                                int64_t bn) {
  int64_t ia = 0, ib = 0;
  int64_t pa = 0, pb = 0;  // end position of the current run
  bool va = false, vb = false;
  int64_t pos = 0, inter = 0;
  if (an > 0) pa = a[0];
  if (bn > 0) pb = b[0];
  // advance past zero-length leading runs
  while (ia < an && pa == pos && ia + 1 < an) {
    va = !va;
    pa += a[++ia];
  }
  while (ib < bn && pb == pos && ib + 1 < bn) {
    vb = !vb;
    pb += b[++ib];
  }
  while (ia < an && ib < bn) {
    int64_t end = std::min(pa, pb);
    if (va && vb) inter += end - pos;
    pos = end;
    if (pa == pos) {
      if (++ia >= an) break;
      va = !va;
      pa += a[ia];
    }
    if (pb == pos) {
      if (++ib >= bn) break;
      vb = !vb;
      pb += b[ib];
    }
  }
  return inter;
}

// Pairwise IoU over D x G rle masks (concatenated counts + offsets).
// crowd gt: denominator is the det area (COCO semantics).
void rle_iou_batch(const int64_t* det_counts, const int64_t* det_offsets,
                   int64_t d, const int64_t* gt_counts,
                   const int64_t* gt_offsets, int64_t g,
                   const uint8_t* gt_crowd, double* out) {
  for (int64_t i = 0; i < d; ++i) {
    const int64_t* dc = det_counts + det_offsets[i];
    int64_t dn = det_offsets[i + 1] - det_offsets[i];
    double da = (double)rle_area(dc, dn);
    for (int64_t j = 0; j < g; ++j) {
      const int64_t* gc = gt_counts + gt_offsets[j];
      int64_t gn = gt_offsets[j + 1] - gt_offsets[j];
      double ga = (double)rle_area(gc, gn);
      double inter = (double)rle_intersection(dc, dn, gc, gn);
      double denom = gt_crowd[j] ? da : da + ga - inter;
      out[i * g + j] = denom > 0 ? inter / denom : 0.0;
    }
  }
}

}  // extern "C"
