from .augmentation import (
    AugInput,
    Augmentation,
    AugmentationList,
    RandomApply,
    RandomBrightness,
    RandomContrast,
    RandomCrop,
    RandomCrop_CategoryAreaConstraint,
    RandomExtent,
    RandomFlip,
    RandomLighting,
    RandomRotation,
    RandomSaturation,
    Resize,
    ResizeShortestEdge,
)
from .transform import (
    BlendTransform,
    ColorTransform,
    PILColorTransform,
    CropTransform,
    ExtentTransform,
    HFlipTransform,
    NoOpTransform,
    PadTransform,
    ResizeTransform,
    RotationTransform,
    Transform,
    TransformList,
    VFlipTransform,
)

__all__ = [k for k in globals().keys() if not k.startswith("_")]
