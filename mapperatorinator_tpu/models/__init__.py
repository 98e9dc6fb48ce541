from .mapperatorinator import Mapperatorinator, MapperatorinatorConfig  # noqa: F401
from .transformer import OsuTransformer, TransformerConfig  # noqa: F401
