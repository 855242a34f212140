"""Stacked hourglass backbones (NHWC, flax).

Rebuilds the reference's three hourglass variants as one module:
  * plain        <- backbones/hourglass.py:12-210 (CenterNet-style:
    stride-2 residual down-path, NO pooling, nearest x2 up-path with a
    size-matching resize, stride-4 stem, inter-stack 1x1 fusion),
  * dense=True   <- backbones/dense_hourglass.py:127-213 (each stack's
    output additionally sums all previous stack outputs + the stem),
  * se=True / pool_stem=True <- backbones/se_hourglass.py:12-228
    (squeeze-excitation in every residual block; stride-1 stem residual
    followed by a 2x2 max-pool; stack conv keeps its ReLU).

Architecture constants match the reference exactly: depth n=5, channels
(256, 256, 384, 384, 384, 512), layer counts (2, 2, 2, 2, 2, 4); each
stack emits a 256-channel stride-4 feature map.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rrnet_tpu.models.layers import (BatchNorm, Conv2d, ConvBN, _StemConv,
                                     torch_conv_init)
from rrnet_tpu.models.layers import max_pool


def _upsample2x_nearest_add(low3, up1):
    """Nearest-neighbor upsample of `low3` to `up1`'s spatial shape plus
    skip-add (reference hourglass.py:110-124: nn.Upsample(scale_factor=2)
    + size-matching interpolate + add).

    For the exact-2x case (every shipped config: inputs are multiples of
    the stride so each level is even) the upsample is expressed as a
    broadcast + reshape instead of `jax.image.resize`: resize lowers to
    a gather, which the TPU serves at a fraction of HBM speed, while the
    broadcast fuses into the add as one streaming pass (~12 ms -> ~1 ms
    over the 10 upsamples of a 2-stack hourglass at 768x1408, PERF.md).
    Nearest resize at exact 2x selects source index floor((2i+1)/2)//1
    == i//2, which is exactly duplication, so the two paths are
    bit-identical; odd sizes fall back to resize."""
    b = low3.shape[:-3]
    h2, w2, c = low3.shape[-3:]
    oh, ow = up1.shape[-3:-1]
    if (oh, ow) != (2 * h2, 2 * w2):
        return up1 + jax.image.resize(
            low3, up1.shape[:-3] + up1.shape[-3:], method="nearest")
    x = jnp.broadcast_to(low3[..., :, None, :, None, :],
                         b + (h2, 2, w2, 2, c))
    return up1 + x.reshape(b + (oh, ow, c))


class SELayer(nn.Module):
    """Squeeze-excitation (reference se_hourglass.py:12-27)."""
    reduction: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(-3, -2))                  # global avg pool
        y = nn.Dense(c // self.reduction, use_bias=False, dtype=self.dtype,
                     name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[..., None, None, :]


class HGResidual(nn.Module):
    """Hourglass residual block with optional SE (reference
    hourglass.py:12-40 / se_hourglass.py:30-60)."""
    features: int
    stride: int = 1
    se: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_features = x.shape[-1]
        out = Conv2d(self.features, (3, 3), strides=(self.stride,) * 2,
                     padding=[(1, 1), (1, 1)], use_bias=False,
                     kernel_init=torch_conv_init, dtype=self.dtype,
                     name="conv1")(x)
        out = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = Conv2d(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                     use_bias=False, kernel_init=torch_conv_init,
                     dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn2")(out, train)
        if self.se:
            out = SELayer(dtype=self.dtype, name="se")(out)

        if self.stride != 1 or in_features != self.features:
            skip = Conv2d(self.features, (1, 1), strides=(self.stride,) * 2,
                          use_bias=False, kernel_init=torch_conv_init,
                          dtype=self.dtype, name="skip_conv")(x)
            skip = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                             name="skip_bn")(skip, train)
        else:
            skip = x
        return nn.relu(out + skip)


class Hourglass(nn.Module):
    """One recursive hourglass (reference hourglass.py:64-124).

    Down path: stride-2 residual (no pooling, hourglass.py:104-108);
    up path: x2 nearest upsample resized to match the skip branch
    (hourglass.py:110-124; exact for the even sizes all shipped configs
    produce)."""
    n: int
    inplanes: Tuple[int, ...]
    layer_nums: Tuple[int, ...]
    se: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur = self.inplanes[0]
        nxt = self.inplanes[1]
        cur_num = self.layer_nums[0]
        nxt_num = self.layer_nums[1]
        kw = dict(se=self.se, bn_axis=self.bn_axis, dtype=self.dtype)

        up1 = x
        for i in range(cur_num):
            up1 = HGResidual(cur, name=f"up1_{i}", **kw)(up1, train)

        low1 = HGResidual(nxt, stride=2, name="low1_0", **kw)(x, train)
        for i in range(1, cur_num):
            low1 = HGResidual(nxt, name=f"low1_{i}", **kw)(low1, train)

        if self.n > 1:
            low2 = Hourglass(self.n - 1, self.inplanes[1:],
                             self.layer_nums[1:], se=self.se,
                             bn_axis=self.bn_axis, dtype=self.dtype,
                             name="low2")(low1, train)
        else:
            low2 = low1
            for i in range(nxt_num):
                low2 = HGResidual(nxt, name=f"low2_{i}", **kw)(low2, train)

        low3 = low2
        for i in range(cur_num - 1):
            low3 = HGResidual(nxt, name=f"low3_{i}", **kw)(low3, train)
        low3 = HGResidual(cur, name=f"low3_{cur_num - 1}", **kw)(low3, train)

        return _upsample2x_nearest_add(low3, up1)


class HourglassNet(nn.Module):
    """Stacked hourglass (reference hourglass.py:127-199 + the dense/SE
    variants). Returns one 256-channel stride-4 NHWC map per stack."""
    num_stacks: int = 2
    dense: bool = False
    se: bool = False
    pool_stem: bool = False
    depth: int = 5
    inplanes: Tuple[int, ...] = (256, 256, 384, 384, 384, 512)
    layer_nums: Tuple[int, ...] = (2, 2, 2, 2, 2, 4)
    num_feats: int = 256
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(se=self.se, bn_axis=self.bn_axis, dtype=self.dtype)

        # Stem to stride 4 (hourglass.py:142-147; se variant uses a
        # stride-1 residual + 2x2 max pool, se_hourglass.py:159-165).
        # 7x7 s2 thin-channel stem via space-to-depth (exact math, ~4x
        # faster on the MXU than the 3-channel strided conv; layers.py)
        x = _StemConv(128, kernel_init=torch_conv_init,
                      dtype=self.dtype, name="pre_conv")(x)
        x = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="pre_bn")(x, train)
        x = nn.relu(x)
        if self.pool_stem:
            x = HGResidual(256, stride=1, name="pre_res", **kw)(x, train)
            x = max_pool(x, 2, 2, 0)
        else:
            x = HGResidual(256, stride=2, name="pre_res", **kw)(x, train)

        pre_feat = x
        outs = []
        skip_feats = [pre_feat] if self.dense else None
        for i in range(self.num_stacks):
            feat = Hourglass(self.depth, self.inplanes, self.layer_nums,
                             name=f"hg{i}", se=self.se, bn_axis=self.bn_axis,
                             dtype=self.dtype)(pre_feat, train)
            # Stack output conv: conv3x3+BN, no relu in the plain/dense
            # variants (hourglass.py:157-159); SE variant keeps relu.
            feat = ConvBN(self.num_feats, kernel=3, with_relu=self.se,
                          bn_axis=self.bn_axis, dtype=self.dtype,
                          name=f"out_conv{i}")(feat, train)
            if self.dense:
                for sf in skip_feats:
                    feat = feat + sf
                skip_feats.append(feat)
            outs.append(feat)
            feat = nn.relu(feat)

            if i < self.num_stacks - 1:
                a = ConvBN(self.inplanes[0], kernel=1, with_relu=False,
                           bn_axis=self.bn_axis, dtype=self.dtype,
                           name=f"inter{i}")(pre_feat, train)
                b = ConvBN(self.inplanes[0], kernel=1, with_relu=False,
                           bn_axis=self.bn_axis, dtype=self.dtype,
                           name=f"fuse{i}")(feat, train)
                pre_feat = nn.relu(a + b)
                pre_feat = HGResidual(self.inplanes[0],
                                      name=f"inter_res{i}", **kw)(pre_feat, train)

        return outs
