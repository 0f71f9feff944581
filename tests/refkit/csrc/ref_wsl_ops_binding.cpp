// Binding that compiles the REFERENCE's own WSL CPU ops
// (/root/reference/projects/WSL/wsl/layers/csrc/{MOIPool,ROILoopPool,
// ROILabel,ROIMerge,pcl_loss}/*_cpu.cpp) into a torch extension exposing
// the same names as the reference's wsl/layers/csrc/vision.cpp module, so
// the WSL model-parity harness (tests/test_wsl_model_parity.py) runs the
// reference python heads on the exact reference ops on CPU. Only the
// binding lives here; the op sources are taken from the read-only
// reference tree at build time.
//
// Excluded from vision.cpp's surface: csc_forward (CUDA-only upstream —
// csc.h's dispatcher AT_ERRORs on CPU; the JAX op keeps its transcription
// golden in tests/test_wsl_parity.py) and crf_forward (depends on the
// un-vendored external densecrf submodule; oracle-pinned in
// tests/test_wsl_crf_reference.py).
//
// The *_backward bindings go straight to the *_cpu kernels because the
// headers' inline dispatchers hard-AT_ERROR on CPU for MOIPool/ROILoopPool
// (upstream trains on GPU only).
#include <torch/extension.h>
#include "MOIPool/MOIPool.h"
#include "ROILabel/ROILabel.h"
#include "ROILoopPool/ROILoopPool.h"
#include "ROIMerge/ROIMerge.h"
#include "pcl_loss/pcl_loss.h"

PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("pcl_loss_forward", &wsl::pcl_loss_forward_cpu, "pcl_loss_forward");
  m.def("pcl_loss_backward", &wsl::pcl_loss_backward_cpu, "pcl_loss_backward");

  m.def("moi_pool_forward", &wsl::MOIPool_forward_cpu, "MOIPool_forward");
  m.def("moi_pool_backward", &wsl::MOIPool_backward_cpu, "MOIPool_backward");

  m.def(
      "roi_loop_pool_forward",
      &wsl::ROILoopPool_forward_cpu,
      "ROILoopPool_forward");
  m.def(
      "roi_loop_pool_backward",
      &wsl::ROILoopPool_backward_cpu,
      "ROILoopPool_backward");

  m.def("roi_merge_forward", &wsl::ROIMerge_forward_cpu, "ROIMerge_forward");
  m.def("roi_merge_backward", &wsl::ROIMerge_backward_cpu, "ROIMerge_backward");

  m.def("roi_label_forward", &wsl::ROILabel_forward_cpu, "ROILabel_forward");
}
