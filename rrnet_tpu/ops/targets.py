"""Device-side CenterNet target rendering.

TPU-native replacement for the reference's CPU per-object gaussian splat
loop (`datasets/transforms/functional.py:177-262`): instead of drawing
each object's gaussian patch into a numpy heatmap inside the dataloader
worker, we render the whole (H, W, C) heatmap on device as a vectorized
masked max over objects, scanned in fixed-size object chunks so memory
stays bounded. This removes the reference's biggest host-side cost from
the input pipeline and keeps target rendering inside the jitted train
step.

Exact parity notes vs the reference:
  * `gaussian_radius` reproduces the CornerNet 3-case formula including
    the well-known (b + sqrt(disc)) / 2 convention (functional.py:177-198).
  * `draw_umich_gaussian` composites with max and clips the gaussian
    window to the radius box intersected with the image
    (functional.py:212-227); here that window is the mask
    |px - cx| <= r and |py - cy| <= r.
  * Centers are floored to int pixels; offsets are the sub-pixel
    residuals (functional.py:253-255).
  * The reference computes `ind` with a hardcoded //4 (functional.py:257)
    even when scale_factor != 4 — a latent quirk; we use scale_factor
    (identical for the shipped configs, which all use 4).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def gaussian_radius(height: jnp.ndarray, width: jnp.ndarray,
                    min_overlap: float = 0.7) -> jnp.ndarray:
    """CornerNet gaussian radius: the minimum of the three quadratic
    roots guaranteeing IoU >= min_overlap. Vectorized over inputs.
    Matches reference functional.py:177-198 (including /2 not /(2a))."""
    h = height.astype(jnp.float32)
    w = width.astype(jnp.float32)

    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 * b1 - 4 * c1, 0.0))
    r1 = (b1 + sq1) / 2.0

    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    sq2 = jnp.sqrt(jnp.maximum(b2 * b2 - 16 * c2, 0.0))
    r2 = (b2 + sq2) / 2.0

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    sq3 = jnp.sqrt(jnp.maximum(b3 * b3 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2.0

    return jnp.minimum(jnp.minimum(r1, r2), r3)


class CenterNetTargets(NamedTuple):
    hm: jnp.ndarray        # (H, W, C) gaussian heatmap in [0, 1]
    wh: jnp.ndarray        # (N, 2) box width/height at feature scale
    ind: jnp.ndarray       # (N,) int32 flat center index y*W + x
    offset: jnp.ndarray    # (N, 2) sub-pixel center offset
    reg_mask: jnp.ndarray  # (N,) float32 validity of each slot


@partial(jax.jit, static_argnames=("feat_shape", "scale_factor",
                                   "num_classes", "chunk", "class_agnostic"))
def render_centernet_targets(
    annos: jnp.ndarray,
    valid: jnp.ndarray,
    feat_shape: Tuple[int, int],
    scale_factor: int = 4,
    num_classes: int = 10,
    chunk: int = 32,
    class_agnostic: bool = False,
) -> CenterNetTargets:
    """Render CenterNet training targets for one image on device.

    annos: (N, >=6) [x, y, w, h, score, cls, ...] in input-image pixels,
           cls in 1..num_classes (VisDrone convention, ignore cls 0 is
           already removed by MaskIgnore).
    valid: (N,) bool mask of real (non-padded) annotation slots.
    feat_shape: (H, W) of the stride-`scale_factor` feature map.

    Replaces reference `to_heatmap` (functional.py:230-262) and, with
    class_agnostic=True, `to_twostage_heatmap` (functional.py:321-353).
    """
    fh, fw = feat_shape
    n = annos.shape[0]
    s = float(scale_factor)

    x1 = annos[:, 0] / s
    y1 = annos[:, 1] / s
    x2 = (annos[:, 0] + annos[:, 2]) / s
    y2 = (annos[:, 1] + annos[:, 3]) / s
    bw = x2 - x1
    bh = y2 - y1

    wh = jnp.stack([bw, bh], axis=-1)
    cx = (x1 + x2) / 2.0
    cy = (y1 + y2) / 2.0
    cx_int = jnp.floor(cx)
    cy_int = jnp.floor(cy)
    offset = jnp.stack([cx - cx_int, cy - cy_int], axis=-1)
    reg_mask = (bh > 0) & (bw > 0) & valid
    ind = (cy_int * fw + cx_int).astype(jnp.int32)
    ind = jnp.clip(ind, 0, fh * fw - 1)

    radius = gaussian_radius(jnp.ceil(bh), jnp.ceil(bw))
    radius = jnp.maximum(jnp.floor(radius), 0.0)

    if class_agnostic:
        cls_idx = jnp.zeros((n,), dtype=jnp.int32)
        c_out = 1
    else:
        cls_idx = jnp.clip(annos[:, 5].astype(jnp.int32) - 1, 0, num_classes - 1)
        c_out = num_classes

    # Pad object dim to a multiple of `chunk` and scan chunks, carrying the
    # composited heatmap: each chunk renders (chunk, H, W) gaussians and
    # max-reduces them into the per-class map.
    pad = (-n) % chunk
    def padded(a, fill=0):
        return jnp.concatenate([a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)]) if pad else a

    cxs = padded(cx_int).reshape(-1, chunk)
    cys = padded(cy_int).reshape(-1, chunk)
    rads = padded(radius).reshape(-1, chunk)
    clss = padded(cls_idx).reshape(-1, chunk)
    live = padded(reg_mask).reshape(-1, chunk)

    px = jnp.arange(fw, dtype=jnp.float32)[None, None, :]   # (1, 1, W)
    py = jnp.arange(fh, dtype=jnp.float32)[None, :, None]   # (1, H, 1)

    def body(hm, chunk_data):
        ccx, ccy, cr, ccls, clive = chunk_data
        dx = px - ccx[:, None, None]
        dy = py - ccy[:, None, None]
        diameter = 2.0 * cr + 1.0
        sigma = diameter / 6.0
        g = jnp.exp(-(dx * dx + dy * dy) /
                    (2.0 * sigma[:, None, None] * sigma[:, None, None]))
        window = (jnp.abs(dx) <= cr[:, None, None]) & (jnp.abs(dy) <= cr[:, None, None])
        g = jnp.where(window & clive[:, None, None], g, 0.0)   # (chunk, H, W)
        onehot = jax.nn.one_hot(ccls, c_out, dtype=jnp.float32)  # (chunk, C)
        contrib = jnp.max(g[:, :, :, None] * onehot[:, None, None, :], axis=0)
        return jnp.maximum(hm, contrib), None

    hm0 = jnp.zeros((fh, fw, c_out), dtype=jnp.float32)
    hm, _ = jax.lax.scan(body, hm0, (cxs, cys, rads, clss, live))

    return CenterNetTargets(
        hm=hm,
        wh=wh.astype(jnp.float32),
        ind=ind,
        offset=offset.astype(jnp.float32),
        reg_mask=reg_mask.astype(jnp.float32),
    )


def render_batch(annos, valid, feat_shape, scale_factor=4, num_classes=10,
                 chunk=32, class_agnostic=False):
    """vmap of render_centernet_targets over the batch dim."""
    fn = partial(
        render_centernet_targets,
        feat_shape=feat_shape,
        scale_factor=scale_factor,
        num_classes=num_classes,
        chunk=chunk,
        class_agnostic=class_agnostic,
    )
    return jax.vmap(fn)(annos, valid)
