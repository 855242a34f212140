"""HRNet backbones (NHWC, flax).

One shared implementation covering the reference's two HRNet variants:
  * pose-style HRNet-w48/w32 (`backbones/hrnet.py:77-311`): 4 stages,
    stage counts (1, 4, 3) modules, branch blocks = 4 BasicBlocks, last
    stage-4 module fuses down to a single stride-4 branch
    (`output_branches=1`, hrnet.py:225); returns `[x0]`.
  * HRNetV2-w40 (`backbones/hrnetv2.py:322-541`): stage counts (1, 4, 3),
    channels (40, 80, 160, 320), the last module keeps all 4 branches and
    forward bilinearly upsamples branches 1..3 to stride 4, returning 4
    maps (hrnetv2.py:512-517); `norm_eval` freezes BN statistics during
    training (hrnetv2.py:520-527).

Fuse semantics: output branch i = relu(sum_j f_ij(branch j)) where
f_ij is identity (i==j), 1x1 conv+BN+nearest-up (i<j), or a chain of
stride-2 3x3 conv+BN(+relu except last) (i>j) — reference
hrnet.py:94-145 / hrnetv2.py:226-296.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rrnet_tpu.models.layers import (BatchNorm, Bottleneck, Conv2d,
                                     torch_conv_init)


def _resize_bilinear_align_corners(x, oh: int, ow: int):
    """Bilinear resize with corner-aligned sampling (torch
    align_corners=True), used by the HRNetV2 output upsample
    (reference hrnetv2.py:512-517). jax.image.resize uses half-pixel
    centers, which differs at the borders."""
    b, h, w, c = x.shape
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.floor(ys).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wy = (ys - y0)[:, None, None]
    x0 = jnp.floor(xs).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wx = (xs - x0)[None, :, None]
    xr0, xr1 = x[:, y0], x[:, y1]
    top = xr0[:, :, x0] * (1 - wx) + xr0[:, :, x1] * wx
    bot = xr1[:, :, x0] * (1 - wx) + xr1[:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class BasicBlock(nn.Module):
    """ResNet BasicBlock, expansion 1 (reference hrnet.py:45-74)."""
    planes: int
    stride: int = 1
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        out = Conv2d(self.planes, (3, 3), strides=(self.stride,) * 2,
                     padding=[(1, 1), (1, 1)], use_bias=False,
                     kernel_init=torch_conv_init, dtype=self.dtype,
                     name="conv1")(x)
        out = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = Conv2d(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                     use_bias=False, kernel_init=torch_conv_init,
                     dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn2")(out, train)
        if self.stride != 1 or in_c != self.planes:
            skip = Conv2d(self.planes, (1, 1), strides=(self.stride,) * 2,
                          use_bias=False, kernel_init=torch_conv_init,
                          dtype=self.dtype, name="down_conv")(x)
            skip = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                             name="down_bn")(skip, train)
        else:
            skip = x
        return nn.relu(out + skip)


class _ConvBNRelu(nn.Module):
    features: int
    stride: int = 1
    relu: bool = True
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.features, (3, 3), strides=(self.stride,) * 2,
                   padding=[(1, 1), (1, 1)], use_bias=False,
                   kernel_init=torch_conv_init, dtype=self.dtype,
                   name="conv")(x)
        x = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn")(x, train)
        return nn.relu(x) if self.relu else x


class StageModule(nn.Module):
    """One HRNet exchange module: per-branch BasicBlock chains followed
    by all-to-all fusion."""
    channels: Tuple[int, ...]       # per-branch widths (input == output)
    num_blocks: int = 4
    output_branches: Optional[int] = None   # None => all branches
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(self.channels)
        n_out = self.output_branches or n
        kw = dict(bn_axis=self.bn_axis, dtype=self.dtype)

        xs = list(xs)
        for j in range(n):
            for b in range(self.num_blocks):
                xs[j] = BasicBlock(self.channels[j],
                                   name=f"branch{j}_block{b}", **kw)(xs[j], train)

        fused = []
        for i in range(n_out):
            acc = None
            for j in range(n):
                if i == j:
                    y = xs[j]
                elif i < j:
                    y = Conv2d(self.channels[i], (1, 1), use_bias=False,
                               kernel_init=torch_conv_init, dtype=self.dtype,
                               name=f"fuse{i}_{j}_conv")(xs[j])
                    y = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                                  name=f"fuse{i}_{j}_bn")(y, train)
                    y = jax.image.resize(y, xs[i].shape[:-1] + (y.shape[-1],),
                                         method="nearest")
                else:  # i > j: chain of stride-2 3x3 convs
                    y = xs[j]
                    for k in range(i - j - 1):
                        y = _ConvBNRelu(self.channels[j], stride=2,
                                        name=f"fuse{i}_{j}_down{k}", **kw)(y, train)
                    y = _ConvBNRelu(self.channels[i], stride=2, relu=False,
                                    name=f"fuse{i}_{j}_down{i - j - 1}",
                                    **kw)(y, train)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


class _HRNetBase(nn.Module):
    """Shared stem + stage machinery."""
    base_channels: int = 48
    stage_modules: Tuple[int, int, int] = (1, 4, 3)
    last_multi_scale: bool = False
    norm_eval: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn_train = train and not self.norm_eval
        c = self.base_channels
        widths = [c, c * 2, c * 4, c * 8]
        kw = dict(bn_axis=self.bn_axis, dtype=self.dtype)

        # Stem: two 3x3/2 convs -> stride 4.
        x = _ConvBNRelu(64, stride=2, name="stem1", **kw)(x, bn_train)
        x = _ConvBNRelu(64, stride=2, name="stem2", **kw)(x, bn_train)

        # Stage 1: 4 bottlenecks (64 planes -> 256 channels).
        for b in range(4):
            x = Bottleneck(64, name=f"layer1_{b}", **kw)(x, bn_train)

        # Transition 1: create branches 0 (stride 4) and 1 (stride 8).
        xs = [
            _ConvBNRelu(widths[0], stride=1, name="trans1_0", **kw)(x, bn_train),
            _ConvBNRelu(widths[1], stride=2, name="trans1_1", **kw)(x, bn_train),
        ]

        # Stage 2.
        for m in range(self.stage_modules[0]):
            xs = StageModule(tuple(widths[:2]), name=f"stage2_{m}", **kw)(xs, bn_train)

        # Transition 2: new stride-16 branch from the lowest branch.
        xs = xs + [_ConvBNRelu(widths[2], stride=2, name="trans2_2",
                               **kw)(xs[-1], bn_train)]

        # Stage 3.
        for m in range(self.stage_modules[1]):
            xs = StageModule(tuple(widths[:3]), name=f"stage3_{m}", **kw)(xs, bn_train)

        # Transition 3: new stride-32 branch.
        xs = xs + [_ConvBNRelu(widths[3], stride=2, name="trans3_3",
                               **kw)(xs[-1], bn_train)]

        # Stage 4.
        n4 = self.stage_modules[2]
        for m in range(n4):
            last = m == n4 - 1
            out_branches = None if (self.last_multi_scale or not last) else 1
            xs = StageModule(tuple(widths), output_branches=out_branches,
                             name=f"stage4_{m}", **kw)(xs, bn_train)

        if not self.last_multi_scale:
            return [xs[0]]
        # HRNetV2: upsample branches 1..3 to stride 4 (bilinear,
        # corner-aligned like the reference hrnetv2.py:512-517).
        target = xs[0].shape
        outs = [xs[0]]
        for i in range(1, 4):
            outs.append(_resize_bilinear_align_corners(
                xs[i], target[1], target[2]))
        return outs


def HRNetW48(**kw):
    return _HRNetBase(base_channels=48, **kw)


def HRNetW32(**kw):
    return _HRNetBase(base_channels=32, **kw)
