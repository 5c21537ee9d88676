from .formatting import (Collect, Compose, DefaultFormatBundle, ImageToTensor,
                         MultiScaleFlipAug)
from .loading import LoadAnnotations, LoadImageFromFile, LoadImageFromWebcam
from .transforms import (Corrupt, Normalize, Pad, PhotoMetricDistortion,
                         RandomCrop, RandomFlip, Resize)
from .mosaic_mixup import MixUp, Mosaic, MultiImageMixDataset, RandomAffine
from .oa_mix import OAMix
from .augmix import AugMix
