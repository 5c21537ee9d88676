from .image import imshow_det_bboxes

__all__ = ["imshow_det_bboxes"]
