from .anchor import AnchorGenerator
from .bbox import (AssignResult, DeltaXYWHBBoxCoder, MaxIoUAssigner,
                   PseudoSampler, RandomSampler, SamplingResult,
                   YOLOBBoxCoder, bbox2result, bbox2roi, bbox_flip,
                   bbox_mapping_back, bbox_overlaps, bbox_overlaps_np,
                   distance2bbox, find_inside_bboxes, roi2bbox)
from .evaluation import COCOEvalBbox, average_precision, eval_map, eval_recalls
from .post_processing import (batched_nms_padded, multiclass_nms, nms_numpy,
                              nms_padded)
from .utils import all_reduce_dict, allreduce_grads, get_dist_info, reduce_mean
