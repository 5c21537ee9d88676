from .nms import batched_nms_padded, multiclass_nms, nms_numpy, nms_padded
