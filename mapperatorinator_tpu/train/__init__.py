from .optim import build_optimizer, build_schedule  # noqa: F401
from .step import TrainState, make_train_step  # noqa: F401
