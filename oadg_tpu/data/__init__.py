from .builder import build_dataloader, build_dataset
from .datasets import custom, coco, xml_style  # noqa: F401

__all__ = ["build_dataloader", "build_dataset"]
