from .config import Config, ConfigDict, DictAction, merge_dict

__all__ = ["Config", "ConfigDict", "DictAction", "merge_dict"]
