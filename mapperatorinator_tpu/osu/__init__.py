"""osu! domain layer: event language, tokenizer, beatmap parsing/rendering,
slider geometry, and timing-point algebra. Pure host-side Python — zero JAX
dependence — shared by the data, inference, and evaluation layers."""

from .events import ContextType, Event, EventRange, EventType  # noqa: F401
from .vocab import MILLISECONDS_PER_STEP, Vocabulary, build_vocabulary  # noqa: F401
