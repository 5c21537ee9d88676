from .registry import (BACKBONES, BBOX_ASSIGNERS, BBOX_CODERS, BBOX_SAMPLERS,
                       DATASETS, DETECTORS, HEADS, HOOKS, IOU_CALCULATORS,
                       LOSSES, MODELS, NECKS, PIPELINES, PRIOR_GENERATORS,
                       ROI_EXTRACTORS, Registry, build_from_cfg)
