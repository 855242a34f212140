"""Shared flax building blocks (NHWC).

TPU-native equivalents of the reference's torch blocks:
  * ConvBN / ConvBNRelu  <- backbones/hourglass.py:43-61 (ConvBNRelu)
  * ResidualBlock        <- backbones/hourglass.py:12-40 (expansion-2
    pre-detector residual with stride-2 downsampling, no pooling)
  * Bottleneck           <- backbones/resnet.py:17-53 (expansion-4)

BatchNorm notes:
  * torch BN(momentum=0.1) == flax BN(momentum=0.9); eps 1e-5.
  * Cross-replica ("Sync") BN — the reference wraps RRNet in
    nn.SyncBatchNorm (operators/rrnet_operator.py:27) — is expressed by
    giving BatchNorm the mesh data-axis name; inside shard_map/pjit the
    batch statistics are then pmean'd over that axis by flax itself.
    `bn_axis=None` reproduces plain per-replica BN (CenterNet/RetinaNet).

Initialization: convs use the torch default kaiming-uniform(a=sqrt(5))
equivalent (variance_scaling(1/3, fan_in, uniform)) so training dynamics
match the reference closely.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

# torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)),
# i.e. variance 1/(3 fan_in).
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# reference ResNet init (backbones/resnet.py:71-74): normal(0, sqrt(2/n)),
# n = k*k*out_channels == fan_out msra.
msra_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BatchNorm(nn.Module):
    """BatchNorm2d with torch-compatible defaults and optional
    cross-replica statistics (SyncBN) via `axis_name`."""
    axis_name: Optional[str] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
        )(x)


class ConvBN(nn.Module):
    """kxk conv (+BN) (+ReLU). Matches reference ConvBNRelu
    (hourglass.py:43-61): bias only when BN is off."""
    features: int
    kernel: int = 3
    stride: int = 1
    with_bn: bool = True
    with_relu: bool = True
    bn_axis: Optional[str] = None
    dtype: Any = None
    kernel_init: Callable = torch_conv_init

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=not self.with_bn,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.with_bn:
            x = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn")(x, train)
        if self.with_relu:
            x = nn.relu(x)
        return x


class ResidualBlock(nn.Module):
    """Hourglass residual block (reference hourglass.py:12-40):
    3x3(s)-BN-relu-3x3-BN with a 1x1(s)-BN skip when shape changes."""
    features: int
    stride: int = 1
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_features = x.shape[-1]
        out = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      kernel_init=torch_conv_init, dtype=self.dtype,
                      name="conv1")(x)
        out = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, kernel_init=torch_conv_init,
                      dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn2")(out, train)

        if self.stride != 1 or in_features != self.features:
            skip = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                           use_bias=False, kernel_init=torch_conv_init,
                           dtype=self.dtype, name="skip_conv")(x)
            skip = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                             name="skip_bn")(skip, train)
        else:
            skip = x
        return nn.relu(out + skip)


class Bottleneck(nn.Module):
    """ResNet bottleneck, expansion 4 (reference resnet.py:17-53)."""
    planes: int
    stride: int = 1
    bn_axis: Optional[str] = None
    dtype: Any = None
    kernel_init: Callable = msra_init

    @nn.compact
    def __call__(self, x, train: bool = False):
        expansion = 4
        in_features = x.shape[-1]
        out_features = self.planes * expansion

        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=self.kernel_init, dtype=self.dtype,
                      name="conv1")(x)
        out = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      kernel_init=self.kernel_init, dtype=self.dtype,
                      name="conv2")(out)
        out = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = nn.Conv(out_features, (1, 1), use_bias=False,
                      kernel_init=self.kernel_init, dtype=self.dtype,
                      name="conv3")(out)
        out = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn3")(out, train)

        if self.stride != 1 or in_features != out_features:
            skip = nn.Conv(out_features, (1, 1), strides=(self.stride,) * 2,
                           use_bias=False, kernel_init=self.kernel_init,
                           dtype=self.dtype, name="downsample_conv")(x)
            skip = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                             name="downsample_bn")(skip, train)
        else:
            skip = x
        return nn.relu(out + skip)


def max_pool(x, window: int, stride: int, padding: int):
    """torch-style MaxPool2d for NHWC."""
    return nn.max_pool(
        x,
        (window, window),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
    )
