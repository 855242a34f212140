"""Model zoo: detector families (CenterNet, RRNet, RetinaNet), backbones,
heads and shared modules — flax.linen, NHWC, TPU-first."""

from rrnet_tpu.models.centernet import CenterNet  # noqa: F401
from rrnet_tpu.models.rrnet import RRNet  # noqa: F401
from rrnet_tpu.models.retinanet import RetinaNet  # noqa: F401
from rrnet_tpu.models.build import build_model  # noqa: F401
