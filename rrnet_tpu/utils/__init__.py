from rrnet_tpu.utils.logger import Logger  # noqa: F401
from rrnet_tpu.utils.timer import Timer  # noqa: F401
