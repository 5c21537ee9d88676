from .hooks import (CheckLossHook, EMAHook, FeatureHook, Hook,
                    NumClassCheckHook, SetEpochInfoHook, SyncNormHook,
                    WandbLogger, WandbLoggerMulti)

__all__ = ["CheckLossHook", "EMAHook", "FeatureHook", "Hook",
           "NumClassCheckHook", "SetEpochInfoHook", "SyncNormHook",
           "WandbLogger", "WandbLoggerMulti"]
