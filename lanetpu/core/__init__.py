from lanetpu.core.config import (
    UNetConfig,
    ResNetConfig,
    YoloConfig,
    PipelineConfig,
    TrainConfig,
    load_config,
)

__all__ = [
    "UNetConfig",
    "ResNetConfig",
    "YoloConfig",
    "PipelineConfig",
    "TrainConfig",
    "load_config",
]
