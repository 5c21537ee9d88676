from .assign_sample import (AssignResult, ATSSAssigner, MaxIoUAssigner,
                            OHEMSampler, PseudoSampler, RandomSampler,
                            SamplingResult)
from .hungarian import HungarianAssigner
from .coder import DeltaXYWHBBoxCoder, YOLOBBoxCoder
from .geometry import bbox_overlaps, bbox_overlaps_np
from .transforms import (bbox2result, bbox2roi, bbox_flip, bbox_mapping_back,
                         distance2bbox, find_inside_bboxes, roi2bbox)
