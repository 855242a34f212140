"""TridentNet (ResNet-v2) backbone (NHWC, flax).

Rebuilds reference `backbones/trident.py:8-278`: a pre-activation
(v2-style) bottleneck ResNet whose third stage is a 3-branch trident —
one shared weight applied at dilations (1, 2, 3) per branch (SharedConv,
trident.py:66-86) — with branches concatenated along the batch dim at
the stage output (trident.py:199-208). The `deform=True` variant swaps
the shared 3x3 for a shared-weight modulated deformable conv
(SharedDefromConv, trident.py:8-63) built on ops.dcn.

Weight sharing is expressed the flax way: the shared kernel is a single
`param`, applied with different dilations via `jax.lax.conv_general_dilated`.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rrnet_tpu.models.layers import (BatchNorm, _StemConv, max_pool,
                                     msra_init, torch_conv_init)


def _shared_conv(x, kernel, stride: int, dilation: int):
    """Apply an HWIO kernel to NHWC input at the given dilation with
    'same-ish' padding (pad == dilation for 3x3, 0 for 1x1)."""
    k = kernel.shape[0]
    pad = dilation if k == 3 else 0
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class SharedConv(nn.Module):
    """One weight, three dilated applications (trident.py:66-86)."""
    features: int
    kernel: int = 3
    stride: int = 1
    dilations: Tuple[int, ...] = (1, 2, 3)
    deform: bool = False
    deformable_groups: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, xs):
        in_c = xs[0].shape[-1]
        w = self.param("weight", msra_init,
                       (self.kernel, self.kernel, in_c, self.features))
        if not self.deform:
            return [_shared_conv(x, w, self.stride, d)
                    for x, d in zip(xs, self.dilations)]

        # Deformable variant: per-branch offset/mask convs (not shared),
        # shared sampling weight — reference SharedDefromConv
        # (trident.py:8-63).
        from rrnet_tpu.ops.dcn import deform_conv2d_auto

        outs = []
        for i, (x, d) in enumerate(zip(xs, self.dilations)):
            om = nn.Conv(self.deformable_groups * 3 * self.kernel * self.kernel,
                         (self.kernel, self.kernel),
                         strides=(self.stride,) * 2,
                         padding=[(d, d), (d, d)],
                         kernel_dilation=(d, d),
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         dtype=self.dtype, name=f"offset_mask{i}")(x)
            n_off = self.deformable_groups * 2 * self.kernel * self.kernel
            offset = om[..., :n_off]
            mask = jax.nn.sigmoid(om[..., n_off:])
            outs.append(deform_conv2d_auto(
                x, w, offset, mask, stride=self.stride, dilation=d,
                padding=d, deformable_groups=self.deformable_groups))
        return outs


class TridentUnit(nn.Module):
    """Pre-activation trident bottleneck (trident.py:89-142): per-branch
    BN+relu, shared 1x1 / (deformable) 3x3 / 1x1 convs."""
    features: int
    stride: int = 1
    deform: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        mid = self.features // 4
        residual = xs

        xs = [nn.relu(BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                                name=f"bn1_{i}")(x, train))
              for i, x in enumerate(xs)]
        xs = SharedConv(mid, kernel=1, dilations=(1, 1, 1),
                        dtype=self.dtype, name="conv1")(xs)
        xs = [nn.relu(BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                                name=f"bn2_{i}")(x, train))
              for i, x in enumerate(xs)]
        xs = SharedConv(mid, kernel=3, stride=self.stride, deform=self.deform,
                        dtype=self.dtype, name="conv2")(xs)
        xs = [nn.relu(BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                                name=f"bn3_{i}")(x, train))
              for i, x in enumerate(xs)]
        xs = SharedConv(self.features, kernel=1, dilations=(1, 1, 1),
                        dtype=self.dtype, name="conv3")(xs)
        if self.stride == 2:
            residual = SharedConv(self.features, kernel=1, stride=2,
                                  dilations=(1, 1, 1), dtype=self.dtype,
                                  name="downsample")(residual)
        return [x + r for x, r in zip(xs, residual)]


class BottleneckV2(nn.Module):
    """Pre-activation bottleneck (trident.py:145-179)."""
    features: int
    stride: int = 1
    downsample: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // 4
        residual = x
        out = nn.relu(BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                                name="bn1")(x, train))
        out = nn.Conv(mid, (1, 1), use_bias=False, kernel_init=msra_init,
                      dtype=self.dtype, name="conv1")(out)
        out = nn.relu(BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                                name="bn2")(out, train))
        out = nn.Conv(mid, (3, 3), strides=(self.stride,) * 2,
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      kernel_init=msra_init, dtype=self.dtype,
                      name="conv2")(out)
        out = nn.relu(BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                                name="bn3")(out, train))
        out = nn.Conv(self.features, (1, 1), use_bias=False,
                      kernel_init=msra_init, dtype=self.dtype,
                      name="conv3")(out)
        if self.downsample:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               kernel_init=msra_init, dtype=self.dtype,
                               name="down_conv")(x)
            residual = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                                 name="down_bn")(residual, train)
        return out + residual


class TridentResNet(nn.Module):
    """ResV2TridentNet (trident.py:212-258): stages 1/2/4 are plain
    BottleneckV2 chains; stage 3 is the trident stage whose three
    branches are concatenated along batch (so l3/l4 have 3x the batch)."""
    depth: int = 50
    deform: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers = (3, 4, 23, 3) if self.depth == 101 else (3, 4, 6, 3)
        kw = dict(bn_axis=self.bn_axis, dtype=self.dtype)

        # 7x7 s2 thin-channel stem via space-to-depth (exact math,
        # ~4x faster on the MXU than a 3-channel strided conv; layers.py)
        x = _StemConv(64, kernel_init=msra_init, dtype=self.dtype,
                      name="conv1")(x)
        x = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, 1)

        def stage(x, features, blocks, stride, name):
            for b in range(blocks):
                x = BottleneckV2(features,
                                 stride=stride if b == 0 else 1,
                                 downsample=b == 0,
                                 name=f"{name}_{b}", **kw)(x, train)
            return x

        l1 = stage(x, 256, layers[0], 1, "layer1")
        l2 = stage(l1, 512, layers[1], 2, "layer2")

        # Trident stage: one BottleneckV2 downsample block, then
        # num_blocks-1 TridentUnits over 3 branches, concat on batch.
        t = BottleneckV2(1024, stride=2, downsample=True,
                         name="layer3_0", **kw)(l2, train)
        branches = [t, t, t]
        for b in range(1, layers[2]):
            branches = TridentUnit(1024, deform=self.deform,
                                   name=f"layer3_{b}", **kw)(branches, train)
        l3 = jnp.concatenate(branches, axis=0)

        l4 = stage(l3, 2048, layers[3], 1, "layer4")
        return l1, l2, l3, l4
