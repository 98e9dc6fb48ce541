from .preprocessor import Preprocessor  # noqa: F401
from .processor import GenerationConfig, Processor, generation_config_from_beatmap  # noqa: F401
