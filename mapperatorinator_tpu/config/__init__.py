from . import schema  # noqa: F401
from .loader import apply_overrides, compose, structure  # noqa: F401
from .schema import (  # noqa: F401
    DiffusionTrainConfig,
    FidConfig,
    InferenceConfig,
    MaiModConfig,
    TrainConfig,
)
