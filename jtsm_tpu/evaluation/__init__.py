from .cityscapes_evaluation import (
    CityscapesInstanceEvaluator,
    CityscapesSemSegEvaluator,
)
from .cocoeval import COCOEval
from .coco_evaluation import COCOEvaluator, COCOProposalEvaluator
from .evaluator import (
    DatasetEvaluator,
    DatasetEvaluators,
    inference_context,
    inference_on_dataset,
)
from .lvis_evaluation import LVISEvaluator
from .panoptic_evaluation import COCOPanopticEvaluator, PQStat, pq_compute_single_image
from .pascal_voc_evaluation import PascalVOCDetectionEvaluator, voc_ap
from .rotated_coco_evaluation import (
    RotatedCOCOEval,
    RotatedCOCOEvaluator,
    pairwise_iou_rotated_np,
)
from .sem_seg_evaluation import SemSegEvaluator
from .testing import flatten_results_dict, print_csv_format, verify_results

__all__ = [k for k in globals().keys() if not k.startswith("_")]
