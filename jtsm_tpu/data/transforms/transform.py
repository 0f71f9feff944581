"""Deterministic, invertible image-space transforms (host-side, numpy).

Reference: detectron2/data/transforms/transform.py (ResizeTransform :94,
RotationTransform :162) and fvcore's Transform base. These run in the data
pipeline on the host; the device never sees them — by the time arrays reach
the TPU they are statically-shaped batches.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


class Transform:
    def apply_image(self, img: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def apply_box(self, box: np.ndarray) -> np.ndarray:
        """(N, 4) XYXY; transforms the 4 corners and takes the new envelope."""
        box = np.asarray(box, dtype=np.float64).reshape(-1, 4)
        idxs = np.array([(0, 1), (2, 1), (0, 3), (2, 3)]).flatten()
        coords = box[:, idxs].reshape(-1, 2)
        coords = self.apply_coords(coords).reshape(-1, 4, 2)
        minxy = coords.min(axis=1)
        maxxy = coords.max(axis=1)
        return np.concatenate((minxy, maxxy), axis=1)

    def apply_polygons(self, polygons: List[np.ndarray]) -> List[np.ndarray]:
        return [self.apply_coords(np.asarray(p).reshape(-1, 2)).reshape(-1) for p in polygons]

    def apply_rotated_box(self, rotated_boxes: np.ndarray) -> np.ndarray:
        """(N, 5) XYWHA. Only transforms with a well-defined action on rotated
        rects implement this (HFlip/Resize/NoOp), mirroring the reference's
        per-type registration (reference transform.py:307,323); anything else
        raises, like an unregistered fvcore type would."""
        raise NotImplementedError(
            f"apply_rotated_box is not defined for {type(self).__name__}"
        )

    def apply_segmentation(self, segmentation: np.ndarray) -> np.ndarray:
        return self.apply_image(segmentation)

    def inverse(self) -> "Transform":
        raise NotImplementedError


class TransformList(Transform):
    def __init__(self, transforms: Sequence[Transform]):
        tfms = []
        for t in transforms:
            if isinstance(t, TransformList):
                tfms.extend(t.transforms)
            else:
                tfms.append(t)
        self.transforms = tfms

    def apply_image(self, img):
        for t in self.transforms:
            img = t.apply_image(img)
        return img

    def apply_coords(self, coords):
        for t in self.transforms:
            coords = t.apply_coords(coords)
        return coords

    def apply_segmentation(self, seg):
        for t in self.transforms:
            seg = t.apply_segmentation(seg)
        return seg

    def apply_rotated_box(self, rotated_boxes):
        for t in self.transforms:
            rotated_boxes = t.apply_rotated_box(rotated_boxes)
        return rotated_boxes

    def inverse(self) -> "TransformList":
        return TransformList([t.inverse() for t in reversed(self.transforms)])

    def __add__(self, other: "TransformList") -> "TransformList":
        others = other.transforms if isinstance(other, TransformList) else [other]
        return TransformList(self.transforms + others)

    def __len__(self):
        return len(self.transforms)

    def __getitem__(self, i):
        return self.transforms[i]


class NoOpTransform(Transform):
    def apply_image(self, img):
        return img

    def apply_coords(self, coords):
        return coords

    def apply_rotated_box(self, rotated_boxes):
        return rotated_boxes

    def inverse(self):
        return self


class ResizeTransform(Transform):
    """Reference transform.py:94."""

    def __init__(self, h: int, w: int, new_h: int, new_w: int, interp=Image.BILINEAR):
        self.h, self.w, self.new_h, self.new_w = h, w, new_h, new_w
        self.interp = interp

    def apply_image(self, img: np.ndarray, interp=None) -> np.ndarray:
        assert img.shape[:2] == (self.h, self.w), (img.shape, self.h, self.w)
        interp = interp if interp is not None else self.interp
        if img.dtype == np.uint8:
            pil = Image.fromarray(img)
            pil = pil.resize((self.new_w, self.new_h), interp)
            return np.asarray(pil)
        # float arrays: resize channel-wise via PIL float mode
        if img.ndim == 2:
            pil = Image.fromarray(img.astype(np.float32), mode="F")
            return np.asarray(pil.resize((self.new_w, self.new_h), interp))
        chans = [
            np.asarray(
                Image.fromarray(img[:, :, c].astype(np.float32), mode="F").resize(
                    (self.new_w, self.new_h), interp
                )
            )
            for c in range(img.shape[2])
        ]
        return np.stack(chans, axis=2)

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] = coords[:, 0] * (self.new_w * 1.0 / self.w)
        coords[:, 1] = coords[:, 1] * (self.new_h * 1.0 / self.h)
        return coords

    def apply_segmentation(self, seg):
        if seg.dtype == np.uint8 or seg.dtype == bool:
            pil = Image.fromarray(seg.astype(np.uint8))
            return np.asarray(pil.resize((self.new_w, self.new_h), Image.NEAREST)).astype(
                seg.dtype
            )
        return self.apply_image(seg, interp=Image.NEAREST)

    def apply_rotated_box(self, rotated_boxes):
        """Anisotropic scaling refits the rotated rect (reference
        transform.py:323 / RotatedBoxes.scale — same math as
        structures.RotatedBoxes.scale, host-side numpy)."""
        rb = np.asarray(rotated_boxes, dtype=np.float64).reshape(-1, 5).copy()
        sx = self.new_w * 1.0 / self.w
        sy = self.new_h * 1.0 / self.h
        theta = rb[:, 4] * np.pi / 180.0
        c, s = np.cos(theta), np.sin(theta)
        rb[:, 0] *= sx
        rb[:, 1] *= sy
        rb[:, 2] *= np.sqrt((sx * c) ** 2 + (sy * s) ** 2)
        rb[:, 3] *= np.sqrt((sx * s) ** 2 + (sy * c) ** 2)
        rb[:, 4] = np.arctan2(sx * s, sy * c) * 180.0 / np.pi
        return rb

    def inverse(self):
        return ResizeTransform(self.new_h, self.new_w, self.h, self.w, self.interp)


class HFlipTransform(Transform):
    def __init__(self, width: int):
        self.width = width

    def apply_image(self, img):
        return np.ascontiguousarray(img[:, ::-1])

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] = self.width - coords[:, 0]
        return coords

    def apply_box(self, box):
        box = np.asarray(box, dtype=np.float64).reshape(-1, 4).copy()
        x0 = self.width - box[:, 2]
        x1 = self.width - box[:, 0]
        box[:, 0], box[:, 2] = x0, x1
        return box

    def apply_rotated_box(self, rotated_boxes):
        """Mirror the center x and negate the angle (reference transform.py:307)."""
        rb = np.asarray(rotated_boxes, dtype=np.float64).reshape(-1, 5).copy()
        rb[:, 0] = self.width - rb[:, 0]
        rb[:, 4] = -rb[:, 4]
        return rb

    def inverse(self):
        return self


class VFlipTransform(Transform):
    def __init__(self, height: int):
        self.height = height

    def apply_image(self, img):
        return np.ascontiguousarray(img[::-1])

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 1] = self.height - coords[:, 1]
        return coords

    def inverse(self):
        return self


class CropTransform(Transform):
    def __init__(self, x0: int, y0: int, w: int, h: int):
        self.x0, self.y0, self.w, self.h = x0, y0, w, h

    def apply_image(self, img):
        return img[self.y0 : self.y0 + self.h, self.x0 : self.x0 + self.w]

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] -= self.x0
        coords[:, 1] -= self.y0
        return coords


class PadTransform(Transform):
    def __init__(self, x0: int, y0: int, x1: int, y1: int, pad_value: float = 0):
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.pad_value = pad_value

    def apply_image(self, img):
        pad_width = [(self.y0, self.y1), (self.x0, self.x1)] + [(0, 0)] * (img.ndim - 2)
        return np.pad(img, pad_width, constant_values=self.pad_value)

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] += self.x0
        coords[:, 1] += self.y0
        return coords


class ColorTransform(Transform):
    """Generic wrapper for photometric-only ops: coordinates are unchanged
    (reference transforms/transform.py:250)."""

    def __init__(self, op):
        if not callable(op):
            raise ValueError("op parameter should be callable")
        self.op = op

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        return self.op(img)

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        return coords

    def apply_segmentation(self, segmentation: np.ndarray) -> np.ndarray:
        return segmentation

    def inverse(self) -> "Transform":
        return NoOpTransform()


class PILColorTransform(ColorTransform):
    """ColorTransform whose op maps PIL.Image -> PIL.Image (reference
    transforms/transform.py:283)."""

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        from PIL import Image

        return np.asarray(self.op(Image.fromarray(np.asarray(img))))


class BlendTransform(Transform):
    """For photometric aug: dst = src_weight * src + dst_weight * img."""

    def __init__(self, src_image, src_weight: float, dst_weight: float):
        self.src_image = src_image
        self.src_weight = src_weight
        self.dst_weight = dst_weight

    def apply_image(self, img):
        if img.dtype == np.uint8:
            img = img.astype(np.float32)
            out = self.src_weight * self.src_image + self.dst_weight * img
            return np.clip(out, 0, 255).astype(np.uint8)
        return self.src_weight * self.src_image + self.dst_weight * img

    def apply_coords(self, coords):
        return coords

    def apply_segmentation(self, seg):
        return seg


class RotationTransform(Transform):
    """Rotate about the image center by `angle` degrees (reference
    transform.py:162); requires cv2 for warps."""

    def __init__(self, h, w, angle, expand=True, center=None, interp=None):
        import cv2

        self.h, self.w, self.angle, self.expand = h, w, angle, expand
        image_center = np.array((w / 2, h / 2))
        if center is None:
            center = image_center
        self.center = center
        self.interp = interp if interp is not None else cv2.INTER_LINEAR
        abs_cos, abs_sin = abs(np.cos(np.deg2rad(angle))), abs(np.sin(np.deg2rad(angle)))
        if expand:
            self.bound_w, self.bound_h = np.rint(
                [h * abs_sin + w * abs_cos, h * abs_cos + w * abs_sin]
            ).astype(int)
        else:
            self.bound_w, self.bound_h = w, h
        self.rm_image = self.create_rotation_matrix()
        self.rm_coords = self.create_rotation_matrix(offset=-0.5)

    def create_rotation_matrix(self, offset=0):
        import cv2

        center = (self.center[0] + offset, self.center[1] + offset)
        rm = cv2.getRotationMatrix2D(tuple(center), self.angle, 1)
        if self.expand:
            rot_im_center = cv2.transform(
                self.center[None, None, :] + offset, rm
            )[0, 0, :]
            new_center = (
                np.array([self.bound_w / 2, self.bound_h / 2]) + offset - rot_im_center
            )
            rm[:, 2] += new_center
        return rm

    def apply_image(self, img, interp=None):
        import cv2

        if len(img) == 0 or self.angle % 360 == 0:
            return img
        interp = interp if interp is not None else self.interp
        return cv2.warpAffine(img, self.rm_image, (self.bound_w, self.bound_h), flags=interp)

    def apply_coords(self, coords):
        import cv2

        coords = np.asarray(coords, dtype=np.float64)
        if len(coords) == 0 or self.angle % 360 == 0:
            return coords
        return cv2.transform(coords[:, np.newaxis, :], self.rm_coords)[:, 0, :]

    def apply_segmentation(self, seg):
        import cv2

        return self.apply_image(seg, interp=cv2.INTER_NEAREST)


class ExtentTransform(Transform):
    """Crop a sub-rect (possibly out of bounds, filled) and resize."""

    def __init__(self, src_rect, output_size, interp=Image.BILINEAR, fill=0):
        self.src_rect = src_rect
        self.output_size = output_size
        self.interp = interp
        self.fill = fill

    def apply_image(self, img, interp=None):
        h, w = self.output_size
        if len(img.shape) > 2 and img.shape[2] == 1:
            pil_image = Image.fromarray(img[:, :, 0], mode="L")
        else:
            pil_image = Image.fromarray(img)
        pil_image = pil_image.transform(
            size=(w, h),
            method=Image.EXTENT,
            data=self.src_rect,
            resample=interp if interp else self.interp,
            fill=self.fill,
        )
        ret = np.asarray(pil_image)
        if len(img.shape) > 2 and img.shape[2] == 1:
            ret = np.expand_dims(ret, -1)
        return ret

    def apply_coords(self, coords):
        h, w = self.output_size
        x0, y0, x1, y1 = self.src_rect
        new_coords = np.asarray(coords, dtype=np.float64).copy()
        new_coords[:, 0] = (coords[:, 0] - x0) * (w / (x1 - x0))
        new_coords[:, 1] = (coords[:, 1] - y0) * (h / (y1 - y0))
        return new_coords

    def apply_segmentation(self, seg):
        return self.apply_image(seg, interp=Image.NEAREST)
