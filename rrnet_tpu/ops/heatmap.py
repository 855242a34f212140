"""CenterNet heatmap decode ops (pure XLA).

Replaces the reference's device-side decode utilities:
  * `_ctnet_nms` 3x3 max-pool peak suppression
    (operators/centernet_operator.py:204-210) -> `peak_nms`,
  * `_topk` / `_gather_feat` / `transform_bbox`
    (models/rrnet.py:93-138, operators/centernet_operator.py:152-202)
    -> `topk_decode`.

Layout note: this framework is NHWC (TPU-native); heatmaps are
(B, H, W, C) and wh/offset maps are (B, H, W, 2).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def peak_nms(hm: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Keep only local maxima of a (..., H, W, C) heatmap: a 3x3 (or kxk)
    max-pool with 'same' padding, zeroing non-peak pixels. Matches the
    reference `_ctnet_nms` (operators/centernet_operator.py:204-210)."""
    pad = (kernel - 1) // 2
    nd = hm.ndim
    window = [1] * nd
    strides = [1] * nd
    padding = [(0, 0)] * nd
    # H and W are the two dims before the trailing channel dim.
    window[-3] = window[-2] = kernel
    padding[-3] = padding[-2] = (pad, pad)
    hmax = jax.lax.reduce_window(
        hm, -jnp.inf, jax.lax.max, tuple(window), tuple(strides), tuple(padding)
    )
    return jnp.where(hmax == hm, hm, 0.0)


class Detections(NamedTuple):
    """Fixed-K decoded detections. boxes are xyxy in feature-map (stride-4)
    coordinates unless scaled by `scale_factor`."""
    boxes: jnp.ndarray    # (..., K, 4) xyxy
    scores: jnp.ndarray   # (..., K)
    classes: jnp.ndarray  # (..., K) int32, 0-based class index
    xs: jnp.ndarray       # (..., K) refined center x
    ys: jnp.ndarray       # (..., K) refined center y


@partial(jax.jit, static_argnames=("k", "use_peak_nms", "apply_sigmoid"))
def topk_decode(
    hm: jnp.ndarray,
    wh: jnp.ndarray,
    offset: Optional[jnp.ndarray],
    k: int = 1500,
    scale_factor: float = 1.0,
    use_peak_nms: bool = False,
    apply_sigmoid: bool = True,
) -> Detections:
    """Decode a batch of CenterNet head outputs to top-k boxes.

    hm: (B, H, W, C) logits (or probabilities with apply_sigmoid=False),
    wh: (B, H, W, 2), offset: (B, H, W, 2) or None.

    Matches reference `transform_bbox` (models/rrnet.py:117-138): global
    top-k over class x location (the reference's per-class-k-then-global-k
    cascade selects exactly the global top-k), center refined by the
    gathered sub-pixel offset (or +0.5 when offset is None, matching
    operators/centernet_operator.py:163-165), wh clamped to >= 0, boxes
    emitted as [cx - w/2, cy - h/2, cx + w/2, cy + h/2] * scale_factor.
    """
    b, h, w, c = hm.shape
    probs = jax.nn.sigmoid(hm) if apply_sigmoid else hm
    if use_peak_nms:
        probs = peak_nms(probs)

    # (B, H*W*C) with flat index = (y * W + x) * C + cls.
    flat = probs.reshape(b, h * w * c)
    top_scores, top_idx = jax.lax.top_k(flat, k)          # (B, K)
    cls = (top_idx % c).astype(jnp.int32)
    loc = top_idx // c                                    # y * W + x
    ys = (loc // w).astype(jnp.float32)
    xs = (loc % w).astype(jnp.float32)

    def gather_map(m):  # (B, H, W, 2) -> (B, K, 2)
        return jnp.take_along_axis(
            m.reshape(b, h * w, 2), loc[..., None], axis=1
        )

    if offset is not None:
        off = gather_map(offset)
        xs = xs + off[..., 0]
        ys = ys + off[..., 1]
    else:
        xs = xs + 0.5
        ys = ys + 0.5

    wh_k = jnp.maximum(gather_map(wh), 0.0)
    half_w = wh_k[..., 0] / 2.0
    half_h = wh_k[..., 1] / 2.0
    boxes = jnp.stack(
        [xs - half_w, ys - half_h, xs + half_w, ys + half_h], axis=-1
    ) * scale_factor
    return Detections(boxes=boxes, scores=top_scores, classes=cls,
                      xs=xs * scale_factor, ys=ys * scale_factor)


def gather_feat(feat: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """Gather (B, L, C) features at (B, N) flat indices -> (B, N, C).
    Replaces reference `_gather_feat` (models/rrnet.py:82-91)."""
    return jnp.take_along_axis(feat, ind[..., None].astype(jnp.int32), axis=1)


def gather_map_at(feat_map: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """Gather an NHWC map (B, H, W, C) at (B, N) flat y*W+x indices ->
    (B, N, C). Replaces `_transpose_and_gather_feat` (models/rrnet.py:111-115);
    no transpose needed in NHWC."""
    b, h, w, c = feat_map.shape
    return gather_feat(feat_map.reshape(b, h * w, c), ind)
