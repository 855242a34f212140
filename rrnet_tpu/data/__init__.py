from rrnet_tpu.data.visdrone import VisDroneDataset, VISDRONE_CLASS_NAMES  # noqa: F401
from rrnet_tpu.data.loader import TrainLoader, ValLoader, make_loaders  # noqa: F401
