from .structures import BitmapMasks, PolygonMasks, paste_masks

__all__ = ["BitmapMasks", "PolygonMasks", "paste_masks"]
