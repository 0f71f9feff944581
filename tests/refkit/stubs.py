"""Minimal faithful stand-ins for the reference's third-party deps.

Only what the reference's import chain + CPU inference path actually touches.
See package docstring for scope. Formulas that affect numerics (roi_align,
nms, losses, weight init) follow the upstream definitions exactly; roi_align
is the reference's own compiled CPU kernel.
"""

import math
import os
import sys
import types

import numpy as np
import torch
import torch.nn as nn

_installed = False


# ---------------------------------------------------------------- torch ext
def _build_ref_ops():
    """Compile the reference's CPU ROIAlign as a torch extension (cached)."""
    import torch.utils.cpp_extension as ce

    build_dir = os.environ.get("JTSM_REF_OPS_BUILD", "/tmp/jtsm_ref_ops_build")
    os.makedirs(build_dir, exist_ok=True)
    return ce.load(
        name="jtsm_ref_ops",
        sources=[
            os.path.join(os.path.dirname(__file__), "csrc/ref_ops_binding.cpp"),
            "/root/reference/detectron2/layers/csrc/ROIAlign/ROIAlign_cpu.cpp",
        ],
        extra_include_paths=["/root/reference/detectron2/layers/csrc/ROIAlign"],
        build_directory=build_dir,
        verbose=False,
    )


def build_ref_wsl_ops():
    """Compile the reference's WSL CPU ops (MOIPool/ROILoopPool/ROILabel/
    ROIMerge/pcl_loss) as a torch extension exposing vision.cpp's names
    (cached). Returned module doubles as ``wsl._C``."""
    import torch.utils.cpp_extension as ce

    csrc = "/root/reference/projects/WSL/wsl/layers/csrc"
    build_dir = os.environ.get(
        "JTSM_REF_WSL_OPS_BUILD", "/tmp/jtsm_ref_wsl_ops_build"
    )
    os.makedirs(build_dir, exist_ok=True)
    return ce.load(
        name="jtsm_ref_wsl_ops",
        sources=[
            os.path.join(os.path.dirname(__file__), "csrc/ref_wsl_ops_binding.cpp"),
            f"{csrc}/MOIPool/MOIPool_cpu.cpp",
            f"{csrc}/ROILabel/ROILabel_cpu.cpp",
            f"{csrc}/ROILoopPool/ROILoopPool_cpu.cpp",
            f"{csrc}/ROIMerge/ROIMerge_cpu.cpp",
            f"{csrc}/pcl_loss/pcl_loss_cpu.cpp",
        ],
        extra_include_paths=[
            csrc,
            # empty <TH/TH.h> stand-in (removed from modern torch; the
            # reference kernels include it but use nothing from it)
            os.path.join(os.path.dirname(__file__), "csrc/compat"),
        ],
        build_directory=build_dir,
        verbose=False,
    )


# ------------------------------------------------------------- torchvision
def _nms(boxes, scores, iou_threshold):
    """Exact greedy NMS with torchvision's IoU convention (no +1)."""
    order = torch.argsort(scores, descending=True)
    boxes = boxes.detach()
    keep = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for oi in order.tolist():
        if suppressed[oi]:
            continue
        keep.append(oi)
        xx1 = torch.maximum(boxes[oi, 0], boxes[:, 0])
        yy1 = torch.maximum(boxes[oi, 1], boxes[:, 1])
        xx2 = torch.minimum(boxes[oi, 2], boxes[:, 2])
        yy2 = torch.minimum(boxes[oi, 3], boxes[:, 3])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[oi] + areas - inter)
        suppressed |= iou > iou_threshold
    return torch.as_tensor(keep, dtype=torch.int64)


def _batched_nms(boxes, scores, idxs, iou_threshold):
    """torchvision's coordinate-offset trick."""
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.int64)
    max_coordinate = boxes.max()
    offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
    boxes_for_nms = boxes + offsets[:, None]
    return _nms(boxes_for_nms, scores, iou_threshold)


def _make_torchvision():
    ref_ops = _build_ref_ops()

    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.15.0"
    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")

    def roi_align(
        input, boxes, output_size, spatial_scale=1.0, sampling_ratio=-1, aligned=False
    ):
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        if isinstance(boxes, (list, tuple)):
            rois = torch.cat(
                [
                    torch.cat(
                        [torch.full((len(b), 1), i, dtype=b.dtype), b], dim=1
                    )
                    for i, b in enumerate(boxes)
                ],
                dim=0,
            )
        else:
            rois = boxes
        return ref_ops.roi_align_forward(
            input.contiguous(),
            rois.contiguous(),
            float(spatial_scale),
            int(output_size[0]),
            int(output_size[1]),
            int(sampling_ratio),
            bool(aligned),
        )

    ops.roi_align = roi_align
    ops.nms = _nms

    def deform_conv2d(*a, **k):
        raise NotImplementedError(
            "refkit stub: deform_conv2d is not needed by the parity models"
        )

    class RoIPool(nn.Module):
        def __init__(self, output_size, spatial_scale):
            super().__init__()
            self.output_size = output_size
            self.spatial_scale = spatial_scale

        def forward(self, input, rois):
            raise NotImplementedError("refkit stub: RoIPool unused by parity models")

    ops.deform_conv2d = deform_conv2d
    ops.RoIPool = RoIPool
    boxes_mod.nms = _nms
    boxes_mod.batched_nms = _batched_nms
    boxes_mod.box_iou = lambda a, b: _box_iou(a, b)
    ops.boxes = boxes_mod
    tv.ops = ops
    return {"torchvision": tv, "torchvision.ops": ops, "torchvision.ops.boxes": boxes_mod}


def _box_iou(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = torch.maximum(a[:, None, :2], b[None, :, :2])
    rb = torch.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


# ------------------------------------------------------------------ fvcore
class Registry:
    def __init__(self, name):
        self._name = name
        self._obj_map = {}

    def _do_register(self, name, obj):
        assert name not in self._obj_map, f"{name} already registered in {self._name}"
        self._obj_map[name] = obj

    def register(self, obj=None):
        if obj is None:
            def deco(f):
                self._do_register(f.__name__, f)
                return f

            return deco
        self._do_register(obj.__name__, obj)
        return obj

    def get(self, name):
        ret = self._obj_map.get(name)
        if ret is None:
            raise KeyError(f"No object named '{name}' found in '{self._name}' registry!")
        return ret

    def __contains__(self, name):
        return name in self._obj_map

    def __iter__(self):
        return iter(self._obj_map.items())


class HistoryBuffer:
    def __init__(self, max_length: int = 1000000):
        self._max_length = max_length
        self._data = []
        self._count = 0
        self._global_avg = 0.0

    def update(self, value, iteration=None):
        if iteration is None:
            iteration = self._count
        if len(self._data) == self._max_length:
            self._data.pop(0)
        self._data.append((value, iteration))
        self._count += 1
        self._global_avg += (value - self._global_avg) / self._count

    def latest(self):
        return self._data[-1][0]

    def median(self, window_size):
        return float(np.median([x[0] for x in self._data[-window_size:]]))

    def avg(self, window_size):
        return float(np.mean([x[0] for x in self._data[-window_size:]]))

    def global_avg(self):
        return self._global_avg

    def values(self):
        return list(self._data)


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        import time

        self._start = time.perf_counter()
        self._paused = None
        self._total_paused = 0.0

    def seconds(self):
        import time

        end = self._paused if self._paused is not None else time.perf_counter()
        return end - self._start - self._total_paused

    def pause(self):
        import time

        self._paused = time.perf_counter()

    def resume(self):
        import time

        if self._paused is not None:
            self._total_paused += time.perf_counter() - self._paused
            self._paused = None

    def is_paused(self):
        return self._paused is not None


def _make_fvcore_cfg():
    """fvcore.common.config.CfgNode backed by jtsm_tpu's CfgNode machinery
    (same yaml/_BASE_ semantics; that loader is itself tested)."""
    from jtsm_tpu.config.cfgnode import CfgNode as _RepoCfg
    from jtsm_tpu.config.cfgnode import _load_yaml_with_base

    class CfgNode(_RepoCfg):
        def __init__(self, init_dict=None, key_list=None, new_allowed=False):
            super().__init__(init_dict)

        @classmethod
        def load_yaml_with_base(cls, filename, allow_unsafe=False):
            return _load_yaml_with_base(filename)

        def clone(self):
            # preserve the (detectron2-subclassed) type: @configurable
            # dispatches on isinstance(cfg, fvcore CfgNode)
            return type(self)(super().clone())

        def merge_from_other_cfg(self, other):
            from jtsm_tpu.config.cfgnode import _merge_a_into_b

            _merge_a_into_b(other, self)

        def dump(self, **kwargs):
            import yaml

            return yaml.safe_dump(self.to_dict(), **kwargs)

    mod = types.ModuleType("fvcore.common.config")
    mod.CfgNode = CfgNode
    return mod


def _make_weight_init():
    mod = types.ModuleType("fvcore.nn.weight_init")

    def c2_msra_fill(module):
        nn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    def c2_xavier_fill(module):
        nn.init.kaiming_uniform_(module.weight, a=1)
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    mod.c2_msra_fill = c2_msra_fill
    mod.c2_xavier_fill = c2_xavier_fill
    return mod


def _make_fvcore_nn():
    mod = types.ModuleType("fvcore.nn")

    def smooth_l1_loss(input, target, beta, reduction="none"):
        if beta < 1e-5:
            loss = torch.abs(input - target)
        else:
            n = torch.abs(input - target)
            cond = n < beta
            loss = torch.where(cond, 0.5 * n**2 / beta, n - 0.5 * beta)
        if reduction == "mean":
            loss = loss.mean() if loss.numel() > 0 else 0.0 * loss.sum()
        elif reduction == "sum":
            loss = loss.sum()
        return loss

    def giou_loss(boxes1, boxes2, reduction="none", eps=1e-7):
        x1, y1, x2, y2 = boxes1.unbind(dim=-1)
        x1g, y1g, x2g, y2g = boxes2.unbind(dim=-1)
        xkis1 = torch.max(x1, x1g)
        ykis1 = torch.max(y1, y1g)
        xkis2 = torch.min(x2, x2g)
        ykis2 = torch.min(y2, y2g)
        intsctk = torch.zeros_like(x1)
        mask = (ykis2 > ykis1) & (xkis2 > xkis1)
        intsctk[mask] = (xkis2[mask] - xkis1[mask]) * (ykis2[mask] - ykis1[mask])
        unionk = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - intsctk
        iouk = intsctk / (unionk + eps)
        xc1 = torch.min(x1, x1g)
        yc1 = torch.min(y1, y1g)
        xc2 = torch.max(x2, x2g)
        yc2 = torch.max(y2, y2g)
        area_c = (xc2 - xc1) * (yc2 - yc1)
        miouk = iouk - ((area_c - unionk) / (area_c + eps))
        loss = 1 - miouk
        if reduction == "mean":
            loss = loss.mean() if loss.numel() > 0 else 0.0 * loss.sum()
        elif reduction == "sum":
            loss = loss.sum()
        return loss

    def sigmoid_focal_loss(inputs, targets, alpha=-1, gamma=2, reduction="none"):
        p = torch.sigmoid(inputs)
        ce_loss = nn.functional.binary_cross_entropy_with_logits(
            inputs, targets, reduction="none"
        )
        p_t = p * targets + (1 - p) * (1 - targets)
        loss = ce_loss * ((1 - p_t) ** gamma)
        if alpha >= 0:
            alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
            loss = alpha_t * loss
        if reduction == "mean":
            loss = loss.mean()
        elif reduction == "sum":
            loss = loss.sum()
        return loss

    mod.smooth_l1_loss = smooth_l1_loss
    mod.giou_loss = giou_loss
    mod.sigmoid_focal_loss = sigmoid_focal_loss
    mod.sigmoid_focal_loss_jit = sigmoid_focal_loss
    mod.smooth_l1_loss_jit = smooth_l1_loss

    def _unsupported(*a, **k):
        raise NotImplementedError("refkit stub: analysis helpers not provided")

    mod.activation_count = _unsupported
    mod.flop_count = _unsupported
    mod.parameter_count = _unsupported
    mod.parameter_count_table = _unsupported
    return mod


def _make_precise_bn():
    mod = types.ModuleType("fvcore.nn.precise_bn")

    def get_bn_modules(model):
        return [
            m
            for m in model.modules()
            if isinstance(m, (nn.BatchNorm2d, nn.SyncBatchNorm)) and m.training
        ]

    def update_bn_stats(*a, **k):
        raise NotImplementedError("refkit stub")

    mod.get_bn_modules = get_bn_modules
    mod.update_bn_stats = update_bn_stats
    return mod


def _make_checkpoint():
    mod = types.ModuleType("fvcore.common.checkpoint")

    class Checkpointer:
        def __init__(self, model, save_dir="", *, save_to_disk=True, **checkpointables):
            self.model = model
            self.save_dir = save_dir
            self.checkpointables = checkpointables

        def save(self, name, **kwargs):
            raise NotImplementedError("refkit stub")

        def load(self, path, checkpointables=None):
            raise NotImplementedError("refkit stub")

    class PeriodicCheckpointer:
        def __init__(self, checkpointer, period, max_iter=None, **kw):
            self.checkpointer = checkpointer

        def step(self, iteration, **kwargs):
            pass

    mod.Checkpointer = Checkpointer
    mod.PeriodicCheckpointer = PeriodicCheckpointer
    return mod


# ---------------------------------------------------------------- transforms
def _make_fvcore_transforms():
    """The fvcore Transform hierarchy: only the geometric members the
    reference's data layer imports at module scope. apply_* follow the
    fvcore definitions."""
    mod = types.ModuleType("fvcore.transforms.transform")

    class Transform:
        def _set_attributes(self, params=None):
            if params:
                for k, v in params.items():
                    if k != "self" and not k.startswith("_"):
                        setattr(self, k, v)

        def apply_image(self, img):
            raise NotImplementedError

        def apply_coords(self, coords):
            raise NotImplementedError

        def apply_box(self, box):
            idxs = np.array([(0, 1), (2, 1), (0, 3), (2, 3)]).flatten()
            coords = np.asarray(box).reshape(-1, 4)[:, idxs].reshape(-1, 2)
            coords = self.apply_coords(coords).reshape((-1, 4, 2))
            minxy = coords.min(axis=1)
            maxxy = coords.max(axis=1)
            return np.concatenate((minxy, maxxy), axis=1)

        def apply_polygons(self, polygons):
            return [self.apply_coords(p) for p in polygons]

        def apply_segmentation(self, segmentation):
            raise NotImplementedError

        @classmethod
        def register_type(cls, data_type, func=None):
            if func is None:
                def wrapper(f):
                    setattr(cls, "apply_" + data_type, f)
                    return f

                return wrapper
            setattr(cls, "apply_" + data_type, func)

        def inverse(self):
            raise NotImplementedError

    class TransformList(Transform):
        def __init__(self, transforms):
            flat = []
            for t in transforms:
                if isinstance(t, TransformList):
                    flat.extend(t.transforms)
                else:
                    flat.append(t)
            self.transforms = flat

        def _apply(self, x, meth):
            for t in self.transforms:
                x = getattr(t, meth)(x)
            return x

        def __getattribute__(self, name):
            if name.startswith("apply_"):
                return lambda x: self._apply(x, name)
            return super().__getattribute__(name)

        def __add__(self, other):
            others = other.transforms if isinstance(other, TransformList) else [other]
            return TransformList(self.transforms + others)

        def __len__(self):
            return len(self.transforms)

        def __getitem__(self, idx):
            return self.transforms[idx]

        def inverse(self):
            return TransformList([t.inverse() for t in self.transforms[::-1]])

    class NoOpTransform(Transform):
        def apply_image(self, img):
            return img

        def apply_coords(self, coords):
            return coords

        def apply_segmentation(self, seg):
            return seg

        def inverse(self):
            return self

        def __getattr__(self, name):
            if name.startswith("apply_"):
                return lambda x: x
            raise AttributeError(name)

    class HFlipTransform(Transform):
        def __init__(self, width):
            self._set_attributes(locals())

        def apply_image(self, img):
            if img.ndim <= 3:
                return np.flip(img, axis=1)
            return np.flip(img, axis=-2)

        def apply_coords(self, coords):
            coords = np.asarray(coords, dtype=np.float64).copy()
            coords[:, 0] = self.width - coords[:, 0]
            return coords

        def apply_segmentation(self, seg):
            return self.apply_image(seg)

        def inverse(self):
            return self

    class VFlipTransform(Transform):
        def __init__(self, height):
            self._set_attributes(locals())

        def apply_image(self, img):
            if img.ndim <= 3:
                return np.flip(img, axis=0)
            return np.flip(img, axis=-3)

        def apply_coords(self, coords):
            coords = np.asarray(coords, dtype=np.float64).copy()
            coords[:, 1] = self.height - coords[:, 1]
            return coords

        def apply_segmentation(self, seg):
            return self.apply_image(seg)

        def inverse(self):
            return self

    class CropTransform(Transform):
        def __init__(self, x0, y0, w, h, orig_w=None, orig_h=None):
            self._set_attributes(locals())

        def apply_image(self, img):
            if img.ndim <= 3:
                return img[self.y0 : self.y0 + self.h, self.x0 : self.x0 + self.w]
            return img[..., self.y0 : self.y0 + self.h, self.x0 : self.x0 + self.w, :]

        def apply_coords(self, coords):
            coords = np.asarray(coords, dtype=np.float64).copy()
            coords[:, 0] -= self.x0
            coords[:, 1] -= self.y0
            return coords

        def apply_segmentation(self, seg):
            return self.apply_image(seg)

    class BlendTransform(Transform):
        def __init__(self, src_image, src_weight, dst_weight):
            self._set_attributes(locals())

        def apply_image(self, img, interp=None):
            if img.dtype == np.uint8:
                img = img.astype(np.float32)
                img = self.src_weight * self.src_image + self.dst_weight * img
                return np.clip(img, 0, 255).astype(np.uint8)
            return self.src_weight * self.src_image + self.dst_weight * img

        def apply_coords(self, coords):
            return coords

        def apply_segmentation(self, seg):
            return seg

        def inverse(self):
            raise NotImplementedError

    class ScaleTransform(Transform):
        def __init__(self, h, w, new_h, new_w, interp=None):
            self._set_attributes(locals())

        def apply_image(self, img, interp=None):
            raise NotImplementedError("refkit stub")

        def apply_coords(self, coords):
            coords = np.asarray(coords, dtype=np.float64).copy()
            coords[:, 0] = coords[:, 0] * (self.new_w * 1.0 / self.w)
            coords[:, 1] = coords[:, 1] * (self.new_h * 1.0 / self.h)
            return coords

        def apply_segmentation(self, seg):
            raise NotImplementedError("refkit stub")

    for n, c in list(locals().items()):
        if isinstance(c, type):
            mod.__dict__[n] = c
    mod.__all__ = [
        "Transform",
        "TransformList",
        "NoOpTransform",
        "HFlipTransform",
        "VFlipTransform",
        "CropTransform",
        "BlendTransform",
        "ScaleTransform",
    ]

    pkg = types.ModuleType("fvcore.transforms")
    pkg.transform = mod
    for n in mod.__all__:
        setattr(pkg, n, getattr(mod, n))
    return pkg, mod


# ------------------------------------------------------------------ iopath
def _make_iopath():
    pkg = types.ModuleType("iopath")
    common = types.ModuleType("iopath.common")
    fio = types.ModuleType("iopath.common.file_io")

    class PathHandler:
        def _get_supported_prefixes(self):
            return []

        def _get_local_path(self, path, **kw):
            raise NotImplementedError

        def _open(self, path, mode="r", **kw):
            raise NotImplementedError

    class NativePathHandler(PathHandler):
        def _get_local_path(self, path, **kw):
            return path

        def _open(self, path, mode="r", **kw):
            return open(path, mode)

    class PathManager:
        def __init__(self):
            self._native = NativePathHandler()
            self._handlers = {}

        def register_handler(self, handler, allow_override=True):
            for p in handler._get_supported_prefixes():
                self._handlers[p] = handler

        def _get_handler(self, path):
            for p, h in self._handlers.items():
                if path.startswith(p):
                    return h
            return self._native

        def open(self, path, mode="r", **kw):
            return self._get_handler(path)._open(path, mode)

        def get_local_path(self, path, **kw):
            return self._get_handler(path)._get_local_path(path)

        def isfile(self, path):
            try:
                return os.path.isfile(self.get_local_path(path))
            except NotImplementedError:
                return False

        def exists(self, path):
            try:
                return os.path.exists(self.get_local_path(path))
            except NotImplementedError:
                return False

        def isdir(self, path):
            return os.path.isdir(path)

        def ls(self, path):
            return sorted(os.listdir(path))

        def mkdirs(self, path):
            os.makedirs(path, exist_ok=True)

        def set_strict_kwargs_checking(self, flag):
            pass

    class HTTPURLHandler(PathHandler):
        def _get_supported_prefixes(self):
            return ["http://", "https://"]

        def _get_local_path(self, path, **kw):
            raise RuntimeError(f"refkit: no network access to fetch {path}")

    class OneDrivePathHandler(PathHandler):
        def _get_supported_prefixes(self):
            return ["https://1drv.ms/"]

    import contextlib

    @contextlib.contextmanager
    def file_lock(path):
        yield

    fio.file_lock = file_lock
    fio.PathHandler = PathHandler
    fio.PathManager = PathManager
    fio.HTTPURLHandler = HTTPURLHandler
    fio.OneDrivePathHandler = OneDrivePathHandler
    fio.NativePathHandler = NativePathHandler

    common.file_io = fio
    pkg.common = common
    return {"iopath": pkg, "iopath.common": common, "iopath.common.file_io": fio}


# -------------------------------------------------------------- pycocotools
def _make_pycocotools():
    from jtsm_tpu.data import rle as _rle

    pkg = types.ModuleType("pycocotools")
    mask_mod = types.ModuleType("pycocotools.mask")

    def encode(mask):
        if mask.ndim == 3:
            return [_rle.rle_string_encode(mask[:, :, i]) for i in range(mask.shape[2])]
        return _rle.rle_string_encode(mask)

    def decode(rle):
        if isinstance(rle, list):
            return np.stack(
                [_rle.decode_segmentation(r, *r["size"]) for r in rle], axis=2
            ).astype(np.uint8)
        return _rle.decode_segmentation(rle, *rle["size"]).astype(np.uint8)

    def area(rle):
        if isinstance(rle, list):
            return np.asarray([_rle.rle_area(r) for r in rle])
        return _rle.rle_area(rle)

    def frPyObjects(objs, h, w):
        from jtsm_tpu.structures.masks import polygons_to_bitmask

        def one(obj):
            if isinstance(obj, dict):
                if isinstance(obj.get("counts"), list):
                    m = _rle.rle_decode_counts(obj["counts"], h, w)
                    return _rle.rle_string_encode(m)
                return obj
            poly = np.asarray(obj, dtype=np.float64)
            m = polygons_to_bitmask([poly], h, w)
            return _rle.rle_string_encode(m)

        if isinstance(objs, (list, tuple)) and len(objs) and not isinstance(objs[0], (int, float)):
            return [one(o) for o in objs]
        return one(objs)

    def merge(rles, intersect=0):
        masks = [_rle.decode_segmentation(r, *r["size"]) for r in rles]
        m = masks[0]
        for x in masks[1:]:
            m = (m & x) if intersect else (m | x)
        return _rle.rle_string_encode(m)

    def toBbox(rle):
        def one(r):
            m = _rle.decode_segmentation(r, *r["size"])
            ys, xs = np.nonzero(m)
            if len(xs) == 0:
                return np.zeros(4)
            return np.asarray(
                [xs.min(), ys.min(), xs.max() - xs.min() + 1, ys.max() - ys.min() + 1],
                dtype=np.float64,
            )

        if isinstance(rle, list):
            return np.stack([one(r) for r in rle])
        return one(rle)

    mask_mod.encode = encode
    mask_mod.decode = decode
    mask_mod.area = area
    mask_mod.frPyObjects = frPyObjects
    mask_mod.merge = merge
    mask_mod.toBbox = toBbox
    pkg.mask = mask_mod
    return {"pycocotools": pkg, "pycocotools.mask": mask_mod}


# ---------------------------------------------------------------- assemble
def install():
    global _installed
    if _installed:
        return

    # Python>=3.10 removed the collections.* ABC aliases the reference uses
    import collections
    import collections.abc

    for abc_name in ("Sequence", "Mapping", "MutableMapping", "Iterable", "Callable"):
        if not hasattr(collections, abc_name):
            setattr(collections, abc_name, getattr(collections.abc, abc_name))

    # Pillow>=10 removed the old resampling aliases the reference uses
    from PIL import Image

    for old, new in (
        ("LINEAR", "BILINEAR"),
        ("CUBIC", "BICUBIC"),
        ("ANTIALIAS", "LANCZOS"),
    ):
        if not hasattr(Image, old):
            setattr(Image, old, getattr(Image, new))

    mods = {}

    fvcore = types.ModuleType("fvcore")
    fvcore.__version__ = "0.1.5"
    common = types.ModuleType("fvcore.common")
    cfg_mod = _make_fvcore_cfg()
    reg_mod = types.ModuleType("fvcore.common.registry")
    reg_mod.Registry = Registry
    hb_mod = types.ModuleType("fvcore.common.history_buffer")
    hb_mod.HistoryBuffer = HistoryBuffer
    timer_mod = types.ModuleType("fvcore.common.timer")
    timer_mod.Timer = Timer
    ckpt_mod = _make_checkpoint()
    common.config = cfg_mod
    common.registry = reg_mod
    common.history_buffer = hb_mod
    common.timer = timer_mod
    common.checkpoint = ckpt_mod
    fvcore.common = common

    nn_mod = _make_fvcore_nn()
    wi_mod = _make_weight_init()
    pbn_mod = _make_precise_bn()
    nn_mod.weight_init = wi_mod
    nn_mod.precise_bn = pbn_mod
    fvcore.nn = nn_mod

    tf_pkg, tf_mod = _make_fvcore_transforms()
    fvcore.transforms = tf_pkg

    mods.update(
        {
            "fvcore": fvcore,
            "fvcore.common": common,
            "fvcore.common.config": cfg_mod,
            "fvcore.common.registry": reg_mod,
            "fvcore.common.history_buffer": hb_mod,
            "fvcore.common.timer": timer_mod,
            "fvcore.common.checkpoint": ckpt_mod,
            "fvcore.nn": nn_mod,
            "fvcore.nn.weight_init": wi_mod,
            "fvcore.nn.precise_bn": pbn_mod,
            "fvcore.transforms": tf_pkg,
            "fvcore.transforms.transform": tf_mod,
        }
    )
    mods.update(_make_torchvision())
    mods.update(_make_iopath())
    mods.update(_make_pycocotools())

    for name, mod in mods.items():
        sys.modules.setdefault(name, mod)
    _installed = True
