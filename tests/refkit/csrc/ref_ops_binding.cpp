// Binding that compiles the REFERENCE's own CPU ROIAlign
// (/root/reference/detectron2/layers/csrc/ROIAlign/ROIAlign_cpu.cpp) into a
// torch extension, so the reference model-parity harness runs the exact
// reference op on CPU. Only the binding lives here; the op source is taken
// from the read-only reference tree at build time.
#include <torch/extension.h>
#include "ROIAlign.h"

PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("roi_align_forward", &detectron2::ROIAlign_forward, "ROIAlign_forward");
  m.def("roi_align_backward", &detectron2::ROIAlign_backward, "ROIAlign_backward");
}
