"""Bottleneck ResNet backbone (NHWC, flax).

Rebuilds reference `backbones/resnet.py:56-143`: 7x7/2 stem + 3x3/2
maxpool, four bottleneck stages, forward returns the (l1, l2, l3, l4)
multi-scale tuple (strides 4/8/16/32, channels 256/512/1024/2048).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as nn

from rrnet_tpu.models.layers import (BatchNorm, Bottleneck, _StemConv,
                                     max_pool, msra_init)


class ResNet(nn.Module):
    layers: Tuple[int, int, int, int]
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # 7x7 s2 thin-channel stem via space-to-depth (exact math,
        # ~4x faster on the MXU than a 3-channel strided conv; layers.py)
        x = _StemConv(64, kernel_init=msra_init, dtype=self.dtype,
                      name="conv1")(x)
        x = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, 1)

        outs = []
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers)
        ):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                x = Bottleneck(planes, stride=stride if b == 0 else 1,
                               bn_axis=self.bn_axis, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x, train)
            outs.append(x)
        return tuple(outs)


def resnet10(**kw) -> ResNet:
    """Bottleneck [1,1,1,1] — the reference's tiny variant
    (backbones/resnet.py:110-119, loads resnet50 weights strict=False)."""
    return ResNet(layers=(1, 1, 1, 1), **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(layers=(3, 4, 23, 3), **kw)
