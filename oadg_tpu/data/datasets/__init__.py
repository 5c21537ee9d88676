from .custom import (ClassBalancedDataset, ConcatDataset, CustomDataset,
                     RepeatDataset)
from .coco import CityscapesDataset, CocoDataset
from .xml_style import SdgodDataset, VOCDataset, XMLDataset
