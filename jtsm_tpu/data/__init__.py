from .build import (
    build_batch_data_loader,
    build_detection_test_loader,
    build_detection_train_loader,
    get_detection_dataset_dicts,
    load_proposals_into_dataset,
    print_instances_class_histogram,
)
from .catalog import DatasetCatalog, Metadata, MetadataCatalog
from .common import AspectRatioGroupedDataset, DatasetFromList, MapDataset
from .dataset_mapper import DatasetMapper
from . import detection_utils
from . import samplers
from . import transforms

__all__ = [k for k in globals().keys() if not k.startswith("_")]

from . import datasets  # noqa: E402,F401  (registers builtin datasets)
