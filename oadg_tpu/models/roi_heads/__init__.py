
from .roi_extractors import GenericRoIExtractor, SingleRoIExtractor
