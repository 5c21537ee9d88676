from .custom import (ClassBalancedDataset, ConcatDataset, CustomDataset,
                     RepeatDataset)
from .coco import CityscapesDataset, CocoDataset
from .more_datasets import (CocoPanopticDataset, DeepFashionDataset,
                            LVISDataset, LVISV05Dataset, LVISV1Dataset,
                            WIDERFaceDataset)
from .xml_style import SdgodDataset, VOCDataset, XMLDataset
