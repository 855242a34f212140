"""ROI Align (pure XLA gather, differentiable).

Replaces `torchvision.ops.roi_align` as used by RRNet stage 2
(models/rrnet.py:51, 3x3 bins over the last-stack stride-4 feature,
spatial_scale=1 because the boxes are already in feature coordinates).

Semantics follow the legacy (aligned=False) torchvision op the reference
ran under PyTorch 1.1: no half-pixel shift, roi extent clamped to >= 1,
bilinear sampling on a regular grid inside each bin, average pooling.
One divergence for static shapes: torchvision's adaptive sampling ratio
(ceil(roi_size / bins) sample points per bin) is data-dependent, so we
use a fixed `sampling_ratio` (default 2) — standard practice and within
interpolation tolerance of the adaptive grid.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Sample feat (H, W, C) at float coords (..., ) -> (..., C).

    Matches the CUDA bilinear_interpolate convention: points outside
    [-1, H) x [-1, W) return 0; coords below 0 are clamped to 0."""
    h, w, _ = feat.shape
    oob = (ys < -1.0) | (ys > h) | (xs < -1.0) | (xs > w)
    ys = jnp.clip(ys, 0.0, h - 1)
    xs = jnp.clip(xs, 0.0, w - 1)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = ys - y0
    lx = xs - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    def at(yi, xi):
        # gather in the feature's native dtype and convert AFTER: for
        # bf16 features this is bit-identical to converting first
        # (bf16->f32 is exact) but halves the gather traffic and avoids
        # XLA materializing an f32 copy of the whole feature map.
        flat = feat.reshape(h * w, -1)
        idx = (yi * w + xi).astype(jnp.int32)
        return flat[idx].astype(jnp.float32)

    y0i, y1i, x0i, x1i = (a.astype(jnp.int32) for a in (y0, y1, x0, x1))
    val = (at(y0i, x0i) * (hy * hx)[..., None] +
           at(y0i, x1i) * (hy * lx)[..., None] +
           at(y1i, x0i) * (ly * hx)[..., None] +
           at(y1i, x1i) * (ly * lx)[..., None])
    return jnp.where(oob[..., None], 0.0, val)


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: Tuple[int, int] = (3, 3),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROI-align one image.

    feat: (H, W, C); rois: (R, 4) xyxy in image coords (scaled by
    spatial_scale into feature coords). Returns (R, out_h, out_w, C).
    Fully differentiable w.r.t. feat (bilinear weights).
    """
    out_h, out_w = output_size
    s = sampling_ratio

    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / out_w
    bin_h = roi_h / out_h

    # sample grid: (out, s) positions per bin axis
    iy = (jnp.arange(out_h)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s)  # (out_h, s)
    ix = (jnp.arange(out_w)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s)

    ys = y1[:, None, None] + iy[None] * bin_h[:, None, None]   # (R, out_h, s)
    xs = x1[:, None, None] + ix[None] * bin_w[:, None, None]   # (R, out_w, s)

    # full grid (R, out_h, s, out_w, s)
    yy = ys[:, :, :, None, None]
    xx = xs[:, None, None, :, :]
    yy, xx = jnp.broadcast_arrays(yy, xx)
    vals = _bilinear_gather(feat, yy, xx)                      # (..., C)
    return vals.mean(axis=(2, 4))                              # (R, out_h, out_w, C)


def batched_roi_align(feats, rois, **kw):
    """vmap over the batch: feats (B, H, W, C), rois (B, R, 4) ->
    (B, R, out_h, out_w, C)."""
    return jax.vmap(lambda f, r: roi_align(f, r, **kw))(feats, rois)
