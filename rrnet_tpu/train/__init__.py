from rrnet_tpu.train.trainer import Trainer  # noqa: F401
from rrnet_tpu.train.state import TrainState, create_train_state  # noqa: F401
from rrnet_tpu.train.schedule import multistep_lr  # noqa: F401
