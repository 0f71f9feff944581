"""SSD-style photometric color augmentation (reference:
projects/PointRend/point_rend/color_augmentation.py:8
``ColorAugSSDTransform``): random brightness / contrast / saturation / hue
jitter applied to the image only (host-side numpy/cv2 — runs in the data
pipeline, never on TPU)."""

from __future__ import annotations

import random

import numpy as np

from jtsm_tpu.data.transforms.transform import Transform

try:  # HSV conversions; cv2 ships in the image
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class ColorAugSSDTransform(Transform):
    def __init__(
        self,
        img_format: str,
        brightness_delta: float = 32,
        contrast_low: float = 0.5,
        contrast_high: float = 1.5,
        saturation_low: float = 0.5,
        saturation_high: float = 1.5,
        hue_delta: int = 18,
    ):
        assert img_format in ["BGR", "RGB"]
        self.is_rgb = img_format == "RGB"
        self.brightness_delta = brightness_delta
        self.contrast_low = contrast_low
        self.contrast_high = contrast_high
        self.saturation_low = saturation_low
        self.saturation_high = saturation_high
        self.hue_delta = hue_delta

    def apply_coords(self, coords):
        return coords

    def apply_segmentation(self, segmentation):
        return segmentation

    def apply_image(self, img, interp=None):
        if self.is_rgb:
            img = img[:, :, [2, 1, 0]]
        img = self.brightness(img)
        if random.randrange(2):
            img = self.contrast(img)
            img = self.saturation(img)
            img = self.hue(img)
        else:
            img = self.saturation(img)
            img = self.hue(img)
            img = self.contrast(img)
        if self.is_rgb:
            img = img[:, :, [2, 1, 0]]
        return img

    @staticmethod
    def _convert(img, alpha=1, beta=0):
        img = img.astype(np.float32) * alpha + beta
        return np.clip(img, 0, 255).astype(np.uint8)

    def brightness(self, img):
        if random.randrange(2):
            return self._convert(
                img, beta=random.uniform(-self.brightness_delta, self.brightness_delta)
            )
        return img

    def contrast(self, img):
        if random.randrange(2):
            return self._convert(
                img, alpha=random.uniform(self.contrast_low, self.contrast_high)
            )
        return img

    def saturation(self, img):
        if random.randrange(2) and cv2 is not None:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
            img[:, :, 1] = self._convert(
                img[:, :, 1],
                alpha=random.uniform(self.saturation_low, self.saturation_high),
            )
            return cv2.cvtColor(img, cv2.COLOR_HSV2BGR)
        return img

    def hue(self, img):
        if random.randrange(2) and cv2 is not None:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
            img[:, :, 0] = (
                img[:, :, 0].astype(int)
                + random.randint(-self.hue_delta, self.hue_delta)
            ) % 180
            return cv2.cvtColor(img, cv2.COLOR_HSV2BGR)
        return img
