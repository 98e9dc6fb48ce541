from .batching import TokenBalancedBatcher, collate_batch, cycle_interleave  # noqa: F401
from .ors import OrsDataset  # noqa: F401
from .sequence import SequenceProcessor  # noqa: F401
