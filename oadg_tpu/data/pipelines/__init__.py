from .formatting import (Collect, Compose, DataContainer,
                         DefaultFormatBundle, ImageToTensor,
                         MultiScaleFlipAug, ToDataContainer, ToTensor,
                         Transpose, WrapFieldsToLists)
from .loading import (FilterAnnotations, LoadAnnotations, LoadImageFromFile,
                      LoadImageFromWebcam, LoadMultiChannelImageFromFiles,
                      LoadPanopticAnnotations, LoadProposals)
from .transforms import (Corrupt, InstaBoost, Normalize, Pad,
                         PhotoMetricDistortion, RandomCrop, RandomFlip,
                         Resize)
from .albu import Albu
from .mosaic_mixup import MixUp, Mosaic, MultiImageMixDataset, RandomAffine
from .oa_mix import OAMix
from .augmix import AugMix
