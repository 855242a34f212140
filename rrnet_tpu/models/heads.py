"""Detection heads ("detectors" in the reference's naming).

Rebuilds:
  * CenterNetHead   <- detectors/centernet_detector.py:6-23
    (per-stack 3x3 conv-256 (no BN) -> 1x1 conv; heatmap bias -2.19),
  * CenterNetWHHead <- detectors/centernet_detector.py:26-77
    (shared 3x3 conv then asymmetric 17x1 (H) and 1x17 (W) convs with
    W/H-interleaved output channels),
  * FasterRCNNHead  <- detectors/fasterrcnn_detector.py:6-18
    (bottleneck on 3x3 ROI features -> global avg pool -> 4 deltas),
  * RetinaNetHead   <- detectors/retinanet_detector.py:4-15
    (4 x (3x3 conv-256 + relu) + 3x3 output conv).

All heads are NHWC. Per-stack heads take a `stack` index selecting an
independent parameter set, mirroring the reference's ModuleLists.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from rrnet_tpu.models.layers import Bottleneck, torch_conv_init


class CenterNetHead(nn.Module):
    """Per-stack [3x3 conv-256 (bias, no BN) + relu] -> 1x1 conv head."""
    planes: int
    num_stacks: int = 2
    is_heatmap: bool = False
    mid_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, stack: int):
        x = nn.Conv(self.mid_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=True, kernel_init=torch_conv_init,
                    dtype=self.dtype, name=f"conv{stack}")(x)
        x = nn.relu(x)
        bias_init = (nn.initializers.constant(-2.19) if self.is_heatmap
                     else nn.initializers.zeros)
        return nn.Conv(self.planes, (1, 1), use_bias=True,
                       kernel_init=torch_conv_init, bias_init=bias_init,
                       dtype=self.dtype, name=f"out{stack}")(x)


class CenterNetWHHead(nn.Module):
    """Asymmetric wh head: shared 3x3 conv, then a (k,1) column conv
    predicting H and a (1,k) row conv predicting W, outputs interleaved
    [W0, H0, W1, H1, ...] (reference detectors/centernet_detector.py:47-55:
    torch.cat((W, H), dim=2) after the view — so channel 0 is W)."""
    planes: int = 1
    num_stacks: int = 2
    kernel: int = 17
    mid_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, stack: int):
        k = self.kernel
        pad = (k - 1) // 2
        conv = nn.Conv(self.mid_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       use_bias=True, kernel_init=torch_conv_init,
                       dtype=self.dtype, name=f"conv{stack}")(x)
        conv = nn.relu(conv)
        h = nn.Conv(self.planes, (k, 1), padding=[(pad, pad), (0, 0)],
                    use_bias=True, kernel_init=torch_conv_init,
                    dtype=self.dtype, name=f"hconv{stack}")(conv)
        w = nn.Conv(self.planes, (1, k), padding=[(0, 0), (pad, pad)],
                    use_bias=True, kernel_init=torch_conv_init,
                    dtype=self.dtype, name=f"wconv{stack}")(conv)
        # interleave: (..., planes, 2) -> (..., 2*planes), order W then H
        out = jnp.stack([w, h], axis=-1)
        return out.reshape(out.shape[:-2] + (2 * self.planes,))


class FasterRCNNHead(nn.Module):
    """RRNet stage-2 regression head: Bottleneck(256->64x4) on the 3x3
    ROI feature, global average pool, 1x1 conv to 4 deltas."""
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feat, train: bool = False):
        # roi_feat: (..., 3, 3, 256)
        x = Bottleneck(planes=64, bn_axis=self.bn_axis, dtype=self.dtype,
                       name="top")(roi_feat, train)
        x = jnp.mean(x, axis=(-3, -2))                 # adaptive avg pool 1x1
        return nn.Dense(4, kernel_init=torch_conv_init, dtype=self.dtype,
                        name="regressor")(x)


class RetinaNetHead(nn.Module):
    """Shared conv tower: 4 x (3x3 conv-256 + relu) + 3x3 output conv."""
    planes: int
    mid_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = nn.Conv(self.mid_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=True, kernel_init=torch_conv_init,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        return nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                       use_bias=True, kernel_init=torch_conv_init,
                       dtype=self.dtype, name="out")(x)
