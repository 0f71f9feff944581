"""Harness that makes the REFERENCE detectron2 (/root/reference, torch) AND
its WSL project importable and runnable on CPU, so model-level numeric
parity can be asserted against them (see docs/notes/reference_parity.md
for the full proof architecture).

The environment has torch (CPU) but none of the reference's other deps
(fvcore, torchvision, pycocotools, yacs). `install_stubs()` registers minimal
faithful stand-ins in sys.modules:

* ``torchvision.ops.roi_align`` / ``nms`` / ``batched_nms`` — roi_align is the
  reference's OWN CPU kernel (layers/csrc/ROIAlign/ROIAlign_cpu.cpp) compiled
  as a torch extension (see csrc/ref_ops_binding.cpp); nms is an exact greedy
  CPU re-statement of torchvision's semantics; batched_nms uses torchvision's
  coordinate-offset trick.
* ``fvcore.*`` — CfgNode (backed by jtsm_tpu's yaml/_BASE_ loader), Registry,
  weight_init (real Caffe2 formulas), smooth_l1/giou/focal losses.
* ``pycocotools.mask`` — backed by jtsm_tpu's own RLE codec.

This is test-support code: nothing here ships in the framework.
"""

import sys

_REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    import os

    return os.path.isdir(_REFERENCE_ROOT + "/detectron2")


def install_stubs():
    from . import stubs

    stubs.install()


def import_reference_wsl():
    """import_reference() plus the reference WSL project: compiles the
    reference's own WSL CPU ops (projects/WSL/wsl/layers/csrc) as a torch
    extension registered as ``wsl._C`` (see csrc/ref_wsl_ops_binding.cpp for
    the exact surface and the CPU exclusions), registers stand-ins for the
    two deps absent from the environment (skimage, pydensecrf — only
    touched by code paths the parity cases never execute), and imports
    ``wsl`` from /root/reference/projects/WSL."""
    import_reference()
    import types

    from . import stubs

    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        measure = types.ModuleType("skimage.measure")

        def _unused(*a, **k):
            raise NotImplementedError(
                "refkit stub: skimage.measure is only used by "
                "binary_mask_to_polygon paths the parity cases do not run"
            )

        measure.find_contours = _unused
        measure.approximate_polygon = _unused
        sk.measure = measure
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = measure
    if "pydensecrf" not in sys.modules:
        pd = types.ModuleType("pydensecrf")
        dc = types.ModuleType("pydensecrf.densecrf")
        ut = types.ModuleType("pydensecrf.utils")

        def _unused(*a, **k):
            raise NotImplementedError("refkit stub: pydensecrf not available")

        dc.DenseCRF2D = _unused
        ut.unary_from_softmax = _unused
        pd.densecrf = dc
        pd.utils = ut
        sys.modules["pydensecrf"] = pd
        sys.modules["pydensecrf.densecrf"] = dc
        sys.modules["pydensecrf.utils"] = ut

    if "wsl._C" not in sys.modules:
        sys.modules["wsl._C"] = stubs.build_ref_wsl_ops()

    wsl_root = _REFERENCE_ROOT + "/projects/WSL"
    if wsl_root not in sys.path:
        sys.path.insert(0, wsl_root)
    import wsl  # noqa: F401
    import wsl.modeling.roi_heads.roi_heads_jtsm  # noqa: F401

    return wsl


def import_reference():
    """Install stubs, put /root/reference on sys.path, import detectron2."""
    install_stubs()
    if _REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, _REFERENCE_ROOT)
    import types

    if "detectron2._C" not in sys.modules:
        _c = types.ModuleType("detectron2._C")

        def _missing(name):
            def f(*a, **k):
                raise NotImplementedError(
                    f"refkit: native op detectron2._C.{name} not wired on CPU"
                )

            return f

        for _name in (
            "nms_rotated",
            "box_iou_rotated",
            "deform_conv_forward",
            "deform_conv_backward_input",
            "deform_conv_backward_filter",
            "modulated_deform_conv_forward",
            "modulated_deform_conv_backward",
            "roi_align_rotated_forward",
            "roi_align_rotated_backward",
            "COCOevalAccumulate",
            "COCOevalEvaluateImages",
        ):
            setattr(_c, _name, _missing(_name))
        _c.get_compiler_version = lambda: "refkit"
        _c.get_cuda_version = lambda: "not available"
        sys.modules["detectron2._C"] = _c

    import detectron2  # noqa: F401

    detectron2._C = sys.modules["detectron2._C"]
    import detectron2.modeling  # noqa: F401

    return detectron2
