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

from rrnet_tpu.models.layers import (BatchNorm, Conv2d, max_pool,
                                     torch_conv_init)


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
            return Conv2d(self.channels, (1, 1), use_bias=True,
                          kernel_init=torch_conv_init, dtype=self.dtype,
                          name=name)(x)

        def smooth(x, name):
            return Conv2d(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
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


class DCNPooling(nn.Module):
    """Deformable PSROI pooling with a learned per-ROI offset trunk
    (ext/dcn/dcn_v2.py:223-303).

    Two-pass design like the reference: (1) plain (no-trans) PSROI
    pooling of each ROI, (2) a 3-layer FC trunk on the pooled features
    predicts per-bin offsets o1/o2 and a mask (final layer zero-init,
    so at init offsets are 0 and mask logits are 0 -> sigmoid 0.5),
    (3) pooling re-run with the offsets and multiplied by the mask.
    With `no_trans=True` this reduces to a single plain pooling pass.

    feat: (B, H, W, C); rois: (R, 5) [batch_idx, x1, y1, x2, y2].
    Returns (R, pooled, pooled, output_dim).
    """
    spatial_scale: float = 1.0
    pooled_size: int = 7
    output_dim: int = 256
    no_trans: bool = False
    group_size: int = 1
    part_size: Optional[int] = None
    sample_per_part: int = 4
    trans_std: float = 0.1
    deform_fc_dim: int = 1024
    dtype: Any = None

    @nn.compact
    def __call__(self, feat, rois):
        from rrnet_tpu.ops.dcn import deform_psroi_pooling

        p = self.pooled_size
        kw = dict(spatial_scale=self.spatial_scale, pooled_size=p,
                  output_dim=self.output_dim, group_size=self.group_size,
                  part_size=self.part_size,
                  sample_per_part=self.sample_per_part)
        b = feat.shape[0]
        b_idx = jnp.clip(rois[:, 0].astype(jnp.int32), 0, b - 1)

        def pool_all(trans, trans_std):
            # static loop over images; each ROI selects its image's rows
            per_img = jnp.stack([
                deform_psroi_pooling(feat[i], rois, trans,
                                     trans_std=trans_std,
                                     no_trans=trans is None, **kw)
                for i in range(b)])                      # (B, R, p, p, C)
            return per_img[b_idx, jnp.arange(rois.shape[0])]

        base = pool_all(None, 0.0)                       # (R, p, p, C)
        if self.no_trans:
            return base

        # FC trunk; flatten in torch (C, ph, pw) order so reference
        # checkpoints remain convertible.
        r = rois.shape[0]
        x = base.transpose(0, 3, 1, 2).reshape(r, -1)
        x = nn.relu(nn.Dense(self.deform_fc_dim, dtype=self.dtype,
                             name="fc1")(x))
        x = nn.relu(nn.Dense(self.deform_fc_dim, dtype=self.dtype,
                             name="fc2")(x))
        x = nn.Dense(3 * p * p, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name="fc3")(x)
        x = x.reshape(r, 3, p, p)
        offset = x[:, :2]                                # (R, 2, p, p)
        mask = jax.nn.sigmoid(x[:, 2:])                  # (R, 1, p, p)
        out = pool_all(offset, self.trans_std)
        return out * mask.transpose(0, 2, 3, 1)          # (R, p, p, 1)
