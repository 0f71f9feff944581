"""ModelCatalog: resolve ``catalog://`` names to Caffe2 Detectron zoo URLs
(reference: detectron2/checkpoint/catalog.py).

These are the legacy pre-detectron2 pretrained weights (ImageNet backbones
in Caffe2 layout and Detectron-v1 baselines). The checkpoint converter
(`c2_model_loading.py`) handles their naming/layout once downloaded (the
PathManager caches under ~/.cache/jtsm_tpu when the environment has
network)."""

from __future__ import annotations

S3_C2_DETECTRON_PREFIX = "https://dl.fbaipublicfiles.com/detectron"

# name -> relative path of ImageNet-pretrained backbones (C2 layout)
_IMAGENET_MODELS = {
    "MSRA/R-50": "ImageNetPretrained/MSRA/R-50.pkl",
    "MSRA/R-101": "ImageNetPretrained/MSRA/R-101.pkl",
    "FAIR/R-50-GN": "ImageNetPretrained/47261647/R-50-GN.pkl",
    "FAIR/R-101-GN": "ImageNetPretrained/47592356/R-101-GN.pkl",
    "FAIR/X-101-32x8d": "ImageNetPretrained/20171220/X-101-32x8d.pkl",
    "FAIR/X-101-64x4d": "ImageNetPretrained/FBResNeXt/X-101-64x4d.pkl",
    "FAIR/X-152-32x8d-IN5k": "ImageNetPretrained/25093814/X-152-32x8d-IN5k.pkl",
}

# Detectron-v1 baselines used by the Detectron1-Comparisons configs
_C2_DETECTRON_MODELS = {
    "35857197/e2e_faster_rcnn_R-50-C4_1x": "35857197/12_2017_baselines/e2e_faster_rcnn_R-50-C4_1x.yaml.01_33_49.iAX0mXvW/output/train/coco_2014_train%3Acoco_2014_valminusminival/generalized_rcnn/model_final.pkl",  # noqa: E501
    "35857345/e2e_faster_rcnn_R-50-FPN_1x": "35857345/12_2017_baselines/e2e_faster_rcnn_R-50-FPN_1x.yaml.01_36_30.cUF7QR7I/output/train/coco_2014_train%3Acoco_2014_valminusminival/generalized_rcnn/model_final.pkl",  # noqa: E501
    "35858933/e2e_mask_rcnn_R-50-C4_1x": "35858933/12_2017_baselines/e2e_mask_rcnn_R-50-C4_1x.yaml.01_45_57.ZgkA7hPB/output/train/coco_2014_train%3Acoco_2014_valminusminival/generalized_rcnn/model_final.pkl",  # noqa: E501
    "35858828/e2e_mask_rcnn_R-50-FPN_1x": "35858828/12_2017_baselines/e2e_mask_rcnn_R-50-FPN_1x.yaml.01_48_14.DzEQe4wC/output/train/coco_2014_train%3Acoco_2014_valminusminival/generalized_rcnn/model_final.pkl",  # noqa: E501
    "37697547/e2e_keypoint_rcnn_R-50-FPN_1x": "37697547/12_2017_baselines/e2e_keypoint_rcnn_R-50-FPN_1x.yaml.08_42_54.kdzV35ao/output/train/keypoints_coco_2014_train%3Akeypoints_coco_2014_valminusminival/generalized_rcnn/model_final.pkl",  # noqa: E501
}


class ModelCatalog:
    """Resolve ``catalog://<name>`` to a concrete URL."""

    PREFIX = "catalog://"

    @staticmethod
    def get(name: str) -> str:
        if name.startswith(ModelCatalog.PREFIX):
            name = name[len(ModelCatalog.PREFIX) :]
        if name.startswith("ImageNetPretrained/"):
            key = name[len("ImageNetPretrained/") :]
            if key in _IMAGENET_MODELS:
                return f"{S3_C2_DETECTRON_PREFIX}/{_IMAGENET_MODELS[key]}"
        if name.startswith("Caffe2Detectron/COCO/"):
            key = name[len("Caffe2Detectron/COCO/") :]
            if key in _C2_DETECTRON_MODELS:
                return f"{S3_C2_DETECTRON_PREFIX}/{_C2_DETECTRON_MODELS[key]}"
        if name in _IMAGENET_MODELS:
            return f"{S3_C2_DETECTRON_PREFIX}/{_IMAGENET_MODELS[name]}"
        if name in _C2_DETECTRON_MODELS:
            return f"{S3_C2_DETECTRON_PREFIX}/{_C2_DETECTRON_MODELS[name]}"
        raise KeyError(f"Unknown model in ModelCatalog: {name}")
