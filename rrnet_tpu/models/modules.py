"""Shared model modules: FPN and local windowed self-attention.

Rebuilds:
  * FPN <- modules/fpn.py:5-51 — 3-level (c3, c4, c5 -> p3, p4, p5):
    1x1 laterals (512/1024/2048 -> 256, with bias), size-matched bilinear
    upsample-add (align_corners=False), 3x3 smoothing on p4/p3.
  * SelfAttentionModule <- modules/self_attention.py:7-102 — local
    (unfold-window) dot-product attention with 1x1 Q/K/V towers and a
    zero-initialized output projection. (Defined but unwired in the
    reference; kept available for the `rrnet_hrnetv2_attention` config.)
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rrnet_tpu.models.layers import BatchNorm, max_pool, torch_conv_init


def _resize_bilinear(x, hw):
    """F.interpolate(..., mode='bilinear', align_corners=False) for NHWC."""
    shape = x.shape[:-3] + (hw[0], hw[1], x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear")


class FPN(nn.Module):
    """3-level feature pyramid (reference modules/fpn.py)."""
    channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, c3, c4, c5):
        def lat(x, name):
            return nn.Conv(self.channels, (1, 1), use_bias=True,
                           kernel_init=torch_conv_init, dtype=self.dtype,
                           name=name)(x)

        def smooth(x, name):
            return nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                           use_bias=True, kernel_init=torch_conv_init,
                           dtype=self.dtype, name=name)(x)

        p5 = lat(c5, "lat5")
        p4 = _resize_bilinear(p5, c4.shape[-3:-1]) + lat(c4, "lat4")
        p4 = smooth(p4, "top4")
        p3 = _resize_bilinear(p4, c3.shape[-3:-1]) + lat(c3, "lat3")
        p3 = smooth(p3, "top3")
        return p3, p4, p5


class SelfAttentionModule(nn.Module):
    """Local windowed self-attention over an NHWC feature map.

    For each query pixel, attends over a (k x k) dilated window of
    keys/values (the reference's F.unfold pattern, expressed here as
    jax.lax.conv_general_dilated_patches). Output projection W is
    zero-initialized so the module starts as identity-plus-nothing
    (self_attention.py:49-50); the result is bilinearly resized back to
    the input size.
    """
    key_channels: int = 64
    value_channels: int = 64
    out_channels: Optional[int] = None
    kernel_size: int = 1
    dilation: int = 1
    padding: int = 0
    stride: int = 1
    scale: int = 1
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_h, in_w = x.shape[-3], x.shape[-2]
        out_c = self.out_channels or x.shape[-1]
        if self.scale > 1:
            x = max_pool(x, self.scale, self.scale, 0)

        def tower(inp, name):
            y = nn.Conv(self.key_channels, (1, 1), dtype=self.dtype,
                        kernel_init=torch_conv_init, name=f"{name}_conv1")(inp)
            y = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                          name=f"{name}_bn1")(y, train)
            y = nn.relu(y)
            y = nn.Conv(self.key_channels, (1, 1), dtype=self.dtype,
                        kernel_init=torch_conv_init, name=f"{name}_conv2")(y)
            y = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                          name=f"{name}_bn2")(y, train)
            return nn.relu(y)

        key = tower(x, "f_key")
        query = tower(x, "f_query")
        value = nn.Conv(self.value_channels, (1, 1), dtype=self.dtype,
                        kernel_init=torch_conv_init, name="f_value")(x)

        k, d, p, s = self.kernel_size, self.dilation, self.padding, self.stride

        def unfold(m):
            """(B, H, W, C) -> (B, oh, ow, k*k, C) window patches."""
            c = m.shape[-1]
            patches = jax.lax.conv_general_dilated_patches(
                m,
                filter_shape=(k, k),
                window_strides=(s, s),
                padding=[(p, p), (p, p)],
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )   # (B, oh, ow, C*k*k), channel-major blocks (c, then window)
            b, oh, ow, _ = patches.shape
            return patches.reshape(b, oh, ow, c, k * k).transpose(0, 1, 2, 4, 3)

        keys = unfold(key)        # (B, oh, ow, kk, Ck)
        values = unfold(value)    # (B, oh, ow, kk, Cv)

        # Query at each window's center position (self_attention.py:84-88).
        start = d * (k // 2) - p
        q = query[:, start::s, start::s, :]
        q = q[:, :keys.shape[1], :keys.shape[2], :]

        sim = jnp.einsum("bhwkc,bhwc->bhwk", keys, q)
        sim = jax.nn.softmax(sim, axis=-1)
        context = jnp.einsum("bhwk,bhwkc->bhwc", sim, values)

        context = nn.Conv(out_c, (1, 1), dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros, name="W")(context)
        return _resize_bilinear(context, (in_h, in_w))
