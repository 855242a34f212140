"""ShuffleNetV2 backbone (NHWC, flax).

Rebuilds reference `backbones/shufflenet.py:48-179`: 0.5x-2.0x width
multipliers, InvertedResidual units with channel shuffle (groups=2),
forward returns the (os8, os16, os32) feature tuple with the final 1x1
conv applied to os32.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from rrnet_tpu.models.layers import (BatchNorm, Conv2d, max_pool,
                                     torch_conv_init)

_STAGE_CHANNELS = {
    "0.5x": (24, 48, 96, 192, 1024),
    "1.0x": (24, 116, 232, 464, 1024),
    "1.5x": (24, 176, 352, 704, 1024),
    "2.0x": (24, 224, 488, 976, 2048),
}
_STAGE_REPEATS = (4, 8, 4)


def channel_shuffle(x, groups: int = 2):
    """NHWC channel shuffle (reference shufflenet.py:31-45)."""
    *lead, c = x.shape
    x = x.reshape(*lead, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(*lead, c)


class _ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    relu: bool = True
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = Conv2d(self.features, (self.kernel, self.kernel),
                   strides=(self.stride,) * 2,
                   padding=[(pad, pad), (pad, pad)],
                   feature_group_count=self.groups, use_bias=False,
                   kernel_init=torch_conv_init, dtype=self.dtype,
                   name="conv")(x)
        x = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn")(x, train)
        return nn.relu(x) if self.relu else x


class InvertedResidual(nn.Module):
    """ShuffleNetV2 unit (reference shufflenet.py:48-113). stride=1 splits
    channels; stride=2 processes the full input in both branches."""
    out_channels: int
    stride: int
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.out_channels // 2
        kw = dict(bn_axis=self.bn_axis, dtype=self.dtype)
        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            b = _ConvBNRelu(half, 1, name="b2_pw", **kw)(x2, train)
            b = _ConvBNRelu(half, 3, stride=1, groups=half, relu=False,
                            name="b2_dw", **kw)(b, train)
            b = _ConvBNRelu(half, 1, name="b2_pwl", **kw)(b, train)
            out = jnp.concatenate([x1, b], axis=-1)
        else:
            in_c = x.shape[-1]
            a = _ConvBNRelu(in_c, 3, stride=2, groups=in_c, relu=False,
                            name="b1_dw", **kw)(x, train)
            a = _ConvBNRelu(half, 1, name="b1_pwl", **kw)(a, train)
            b = _ConvBNRelu(half, 1, name="b2_pw", **kw)(x, train)
            b = _ConvBNRelu(half, 3, stride=2, groups=half, relu=False,
                            name="b2_dw", **kw)(b, train)
            b = _ConvBNRelu(half, 1, name="b2_pwl", **kw)(b, train)
            out = jnp.concatenate([a, b], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2(nn.Module):
    width: str = "1.0x"
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = _STAGE_CHANNELS[self.width]
        kw = dict(bn_axis=self.bn_axis, dtype=self.dtype)
        x = _ConvBNRelu(chans[0], 3, stride=2, name="conv1", **kw)(x, train)
        x = max_pool(x, 3, 2, 1)

        outs = []
        for stage, repeats in enumerate(_STAGE_REPEATS):
            out_c = chans[stage + 1]
            for i in range(repeats):
                x = InvertedResidual(out_c, stride=2 if i == 0 else 1,
                                     name=f"stage{stage}_{i}", **kw)(x, train)
            outs.append(x)
        outs[-1] = _ConvBNRelu(chans[-1], 1, name="conv_last", **kw)(outs[-1], train)
        return tuple(outs)   # (os8, os16, os32)
