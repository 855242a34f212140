"""RetinaNet detector (reference models/retinanet.py:8-38).

ResNet (c3, c4, c5) -> 3-level FPN -> shared cls / loc conv towers per
level, flattened anchor-major to (B, sum(H*W*A), {num_classes, 4}).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from rrnet_tpu.models.backbones import get_backbone
from rrnet_tpu.models.heads import RetinaNetHead
from rrnet_tpu.models.modules import FPN


class RetinaNet(nn.Module):
    num_classes: int = 10
    num_anchors: int = 9
    backbone: str = "resnet50"
    fpn_channels: int = 256
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        l1, l2, l3, l4 = get_backbone(self.backbone, bn_axis=self.bn_axis,
                                      dtype=self.dtype)(x, train)
        fms = FPN(channels=self.fpn_channels, dtype=self.dtype,
                  name="fpn")(l2, l3, l4)

        cls_head = RetinaNetHead(self.num_anchors * self.num_classes,
                                 dtype=self.dtype, name="cls")
        loc_head = RetinaNetHead(self.num_anchors * 4, dtype=self.dtype,
                                 name="loc")

        b = x.shape[0]
        loc_outs, cls_outs = [], []
        for fm in fms:
            # NHWC with A-major channels -> (B, H*W*A, ·); same memory
            # order as the reference's permute+view (models/retinanet.py:22-26).
            loc = loc_head(fm).reshape(b, -1, 4)
            cls = cls_head(fm).reshape(b, -1, self.num_classes)
            loc_outs.append(loc)
            cls_outs.append(cls)
        return jnp.concatenate(loc_outs, 1), jnp.concatenate(cls_outs, 1)
