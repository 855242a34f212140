"""Device ops library — TPU-native replacements for the reference's
`ext/` C/CUDA/Cython extensions and torchvision ops.

Every op here is jittable with static shapes; dynamic result counts are
expressed as (values, validity-mask) pairs.
"""

from rrnet_tpu.ops.box import (  # noqa: F401
    pairwise_iou,
    pairwise_iou_xywh,
    box_area,
    xywh_to_xyxy,
    xyxy_to_xywh,
    encode_boxes,
    decode_boxes,
    giou,
)
from rrnet_tpu.ops.nms import hard_nms, soft_nms, batched_nms  # noqa: F401
from rrnet_tpu.ops.heatmap import peak_nms, topk_decode  # noqa: F401
from rrnet_tpu.ops.targets import gaussian_radius, render_centernet_targets  # noqa: F401
from rrnet_tpu.ops.roi_align import roi_align, batched_roi_align  # noqa: F401
from rrnet_tpu.ops.dcn import (deform_conv2d, deform_conv2d_auto,  # noqa: F401
                               deform_psroi_pooling)
from rrnet_tpu.ops.kmeans import kmeans  # noqa: F401
