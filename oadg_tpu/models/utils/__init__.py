from .misc import (NormedConv2d, NormedLinear, ResLayer, SELayer,
                   build_linear_layer, gaussian_radius, gen_gaussian_target,
                   interpolate_as)
from .transformer import (DecoderLayer, EncoderLayer, FFN,
                          SinePositionalEncoding, Transformer)

__all__ = ["NormedConv2d", "NormedLinear", "ResLayer", "SELayer",
           "build_linear_layer", "gaussian_radius", "gen_gaussian_target",
           "interpolate_as", "DecoderLayer", "EncoderLayer", "FFN",
           "SinePositionalEncoding", "Transformer"]
