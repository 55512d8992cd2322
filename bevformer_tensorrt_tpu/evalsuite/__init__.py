from .nds import EvalBox, evaluate_nuscenes, DETECTION_CLASSES  # noqa: F401
from .coco_map import evaluate_coco_map, box_iou  # noqa: F401
from .format import detections_to_eval_boxes, gt_to_eval_boxes  # noqa: F401
