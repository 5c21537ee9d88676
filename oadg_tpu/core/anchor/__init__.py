from .anchor_generator import AnchorGenerator, SSDAnchorGenerator

__all__ = ["AnchorGenerator", "SSDAnchorGenerator"]
