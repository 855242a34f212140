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

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)),
# i.e. variance 1/(3 fan_in).
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# reference ResNet init (backbones/resnet.py:71-74): normal(0, sqrt(2/n)),
# n = k*k*out_channels == fan_out msra.
msra_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class _InferenceBN(nn.Module):
    """Inference-mode BN as one folded affine in the ACTIVATION dtype.

    flax's nn.BatchNorm promotes x to f32 at inference (its stats are
    f32 params), leaving a convert -> affine -> convert sandwich that
    XLA cannot fuse into the producing conv's epilogue: at 768x1408
    batch 16 those passes cost ~11 ms of pure HBM traffic (measured,
    PERF.md). Here `mul`/`add` are derived from the same variables in
    f32 (constant-folded at compile time when the Evaluator closes over
    BN stats) and only then cast to x.dtype, so the whole layer is a
    bf16 multiply-add that fuses into the conv.

    Variable names/shapes are exactly nn.BatchNorm's (scale, bias /
    batch_stats mean, var) — checkpoints and converters are unaffected.
    """
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (x.shape[-1],)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(shape, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(shape, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, shape,
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, shape,
                          jnp.float32)
        mul = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
        add = bias - ra_mean.value * mul
        return x * mul.astype(x.dtype) + add.astype(x.dtype)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch-compatible defaults and optional
    cross-replica statistics (SyncBN) via `axis_name`."""
    axis_name: Optional[str] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        if not train:
            # same scope name nn.BatchNorm would auto-take, so the
            # variable tree is identical between the two branches
            return _InferenceBN(epsilon=self.epsilon,
                                name="BatchNorm_0")(x)
        return nn.BatchNorm(
            use_running_average=False,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x)


def _stem_conv_s2d(x, w, dtype):
    """7x7 stride-2 conv on a thin-channel input (the stem), computed as
    2x2 space-to-depth + 4x4 stride-1 conv — EXACT same math.

    A 3-channel conv input pads to the 8-sublane minimum on the MXU,
    wasting >half of every pass (measured: the stem was 6.1 ms of the
    768x1408 eval forward vs a 0.8 ms FLOP floor). Folding the stride
    into the layout quadruples the input channels (3 -> 12) and turns
    the strided 7x7 into a dense 4x4:

        y[i,j] = sum_{u,v} w[u,v] x[2i+u-3, 2j+v-3]
               = sum_{a,dy} w[2a+dy-1+2] x_s2d[i+a-2][dy]   (both axes)

    so w'[a, b, (dy,dx,c)] = w[2a+dy-1, 2b+dx-1, c] (zero where the
    index is -1) with asymmetric padding (2, 1). Parameters keep the
    reference (7,7,C,F) layout, so checkpoints/converters see nothing."""
    h, w_dim = x.shape[1], x.shape[2]
    b, cin = x.shape[0], x.shape[3]
    # space-to-depth: (B, H, W, C) -> (B, H/2, W/2, 4C), channel order
    # (dy, dx, c)
    xs = x.reshape(b, h // 2, 2, w_dim // 2, 2, cin)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w_dim // 2,
                                                4 * cin)
    # kernel remap: w (7,7,C,F) -> w' (4,4,4C,F)
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))   # u' = u+1 = 2a+dy
    wp = wp.reshape(4, 2, 4, 2, cin, w.shape[-1])
    wp = wp.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, w.shape[-1])
    if dtype is not None:
        xs = xs.astype(dtype)
        wp = wp.astype(dtype)
    return jax.lax.conv_general_dilated(
        xs, wp, window_strides=(1, 1), padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _StemConv(nn.Module):
    """Owns the (7,7,C,F) kernel under the same {scope}/kernel name as
    nn.Conv (checkpoint/converter-compatible) but computes the conv via
    the space-to-depth reformulation."""
    features: int
    kernel_init: Callable = torch_conv_init
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", self.kernel_init,
                       (7, 7, x.shape[-1], self.features))
        if x.shape[1] % 2 or x.shape[2] % 2:
            # odd inputs can't space-to-depth; plain strided conv
            xc = x if self.dtype is None else x.astype(self.dtype)
            wc = w if self.dtype is None else w.astype(self.dtype)
            return jax.lax.conv_general_dilated(
                xc, wc, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return _stem_conv_s2d(x, w, self.dtype)


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
