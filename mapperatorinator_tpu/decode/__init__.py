from .logits import LogitsPipeline, build_logits_pipeline  # noqa: F401
from .engine import DecodeEngine, GenerationParams  # noqa: F401
