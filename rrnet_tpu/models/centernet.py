"""CenterNet detector (reference models/centernet.py:8-33).

Stacked backbone -> per-stack relu -> heatmap (num_classes ch) / wh
(asymmetric-kernel, 2 ch) / offset (2 ch) heads. Returns per-stack lists
of NHWC maps; decoding lives in ops.heatmap (device) and evallib (TTA).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

from flax import linen as nn

from rrnet_tpu.models.backbones import get_backbone
from rrnet_tpu.models.heads import CenterNetHead, CenterNetWHHead


class CenterNet(nn.Module):
    num_classes: int = 10
    num_stacks: int = 2
    backbone: str = "hourglass"
    wh_kernel: int = 17
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = get_backbone(self.backbone, self.num_stacks, self.bn_axis,
                             self.dtype)(x, train)
        hm_head = CenterNetHead(self.num_classes, num_stacks=self.num_stacks,
                                is_heatmap=True, dtype=self.dtype, name="hm")
        wh_head = CenterNetWHHead(1, num_stacks=self.num_stacks,
                                  kernel=self.wh_kernel, dtype=self.dtype,
                                  name="wh")
        reg_head = CenterNetHead(2, num_stacks=self.num_stacks,
                                 dtype=self.dtype, name="reg")

        hms, whs, regs = [], [], []
        for i in range(self.num_stacks):
            f = nn.relu(feats[i])
            hms.append(hm_head(f, i))
            whs.append(wh_head(f, i))
            regs.append(reg_head(f, i))
        return hms, whs, regs
