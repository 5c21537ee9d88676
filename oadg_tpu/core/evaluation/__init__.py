from .coco_eval import COCOEvalBbox
from .mean_ap import average_precision, eval_map, eval_recalls
