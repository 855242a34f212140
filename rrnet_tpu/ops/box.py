"""Box geometry ops.

TPU-native equivalents of the reference's box utilities:
  * `utils/metrics/metrics.py:10-48` (bbox_iou incl. the overlap-in-a mode
    used by the VisDrone ignore-region protocol),
  * `utils/functional.py:7-26` (xywh/xyxy conversion),
  * `operators/rrnet_operator.py:86-102` (Faster-RCNN-style delta encoding
    with the legacy +1 extents),
  * `modules/loss/functional.py:132-160` (GIoU).

All functions are pure jnp and broadcast over leading batch dims unless
noted. Pairwise functions take (M,4) x (N,4) -> (M,N).
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [x, y, w, h] -> [x1, y1, x2, y2]."""
    xy = boxes[..., :2]
    wh = boxes[..., 2:4]
    return jnp.concatenate([xy, xy + wh], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [x1, y1, x2, y2] -> [x, y, w, h]."""
    xy1 = boxes[..., :2]
    xy2 = boxes[..., 2:4]
    return jnp.concatenate([xy1, xy2 - xy1], axis=-1)


def box_area(boxes: jnp.ndarray, plus_one: bool = False) -> jnp.ndarray:
    """Area of (..., 4) xyxy boxes. `plus_one=True` uses the legacy
    (x2-x1+1)*(y2-y1+1) convention of the reference's Cython NMS
    (ext/nms/nms/cpu_nms.pyx:83)."""
    off = 1.0 if plus_one else 0.0
    return (boxes[..., 2] - boxes[..., 0] + off) * (boxes[..., 3] - boxes[..., 1] + off)


def pairwise_iou(
    a: jnp.ndarray,
    b: jnp.ndarray,
    plus_one: bool = False,
    return_overlap: bool = False,
):
    """Pairwise IoU between (M,4) and (N,4) xyxy boxes -> (M,N).

    Matches reference `bbox_iou` (utils/metrics/metrics.py:10-48): the
    union is clamped to >= 1e-8. With `return_overlap=True` also returns
    intersection / area(a) (the "overlap of a in b" used by the VisDrone
    ignore-region filter, metrics.py:45-46).
    """
    off = 1.0 if plus_one else 0.0
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    iw = jnp.minimum(a[:, None, 2], b[None, :, 2]) - jnp.maximum(a[:, None, 0], b[None, :, 0]) + off
    ih = jnp.minimum(a[:, None, 3], b[None, :, 3]) - jnp.maximum(a[:, None, 1], b[None, :, 1]) + off
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    area_a = box_area(a, plus_one)
    area_b = box_area(b, plus_one)
    union = area_a[:, None] + area_b[None, :] - inter
    union = jnp.maximum(union, 1e-8)
    iou = inter / union
    if return_overlap:
        overlap = inter / jnp.maximum(area_a[:, None], 1e-8)
        return iou, overlap
    return iou


def pairwise_iou_xywh(a: jnp.ndarray, b: jnp.ndarray, **kw):
    """Pairwise IoU where inputs are xywh (reference bbox_iou x1y1x2y2=False)."""
    return pairwise_iou(xywh_to_xyxy(a), xywh_to_xyxy(b), **kw)


def encode_boxes(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Faster-RCNN-style regression targets from example ROIs to GT boxes.

    Matches reference `generate_bbox_target` (operators/rrnet_operator.py:86-102):
    extents use the legacy +1.0 convention. Inputs (..., 4) xyxy, output
    (..., 4) [dx, dy, dw, dh].
    """
    ex_w = ex_rois[..., 2] - ex_rois[..., 0] + 1.0
    ex_h = ex_rois[..., 3] - ex_rois[..., 1] + 1.0
    ex_cx = ex_rois[..., 0] + 0.5 * ex_w
    ex_cy = ex_rois[..., 1] + 0.5 * ex_h

    gt_w = gt_rois[..., 2] - gt_rois[..., 0] + 1.0
    gt_h = gt_rois[..., 3] - gt_rois[..., 1] + 1.0
    gt_cx = gt_rois[..., 0] + 0.5 * gt_w
    gt_cy = gt_rois[..., 1] + 0.5 * gt_h

    dx = (gt_cx - ex_cx) / ex_w
    dy = (gt_cy - ex_cy) / ex_h
    dw = jnp.log(gt_w / ex_w)
    dh = jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(rois_xywh: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Apply stage-2 regression deltas to xywh ROIs, matching reference
    `generate_bbox` (operators/rrnet_operator.py:200-208): the ROI wh is
    bumped by +1 before decoding. Returns xywh boxes."""
    w = rois_xywh[..., 2] + 1.0
    h = rois_xywh[..., 3] + 1.0
    ctr_x = deltas[..., 0] * w + rois_xywh[..., 0] + w / 2.0
    ctr_y = deltas[..., 1] * h + rois_xywh[..., 1] + h / 2.0
    out_w = jnp.exp(deltas[..., 2]) * w
    out_h = jnp.exp(deltas[..., 3]) * h
    out_x = ctr_x - out_w / 2.0
    out_y = ctr_y - out_h / 2.0
    return jnp.stack([out_x, out_y, out_w, out_h], axis=-1)


def giou(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GIoU between (..., 4) xyxy boxes, matching reference
    `_giou_loss` (modules/loss/functional.py:132-160) before the final
    (1 - giou).mean() reduction. Returns (...,) giou values."""
    x1, y1, x2, y2 = output[..., 0], output[..., 1], output[..., 2], output[..., 3]
    x1g, y1g, x2g, y2g = target[..., 0], target[..., 1], target[..., 2], target[..., 3]

    x2 = jnp.maximum(x1, x2)
    y2 = jnp.maximum(y1, y2)

    xi1 = jnp.maximum(x1, x1g)
    yi1 = jnp.maximum(y1, y1g)
    xi2 = jnp.minimum(x2, x2g)
    yi2 = jnp.minimum(y2, y2g)

    xc1 = jnp.minimum(x1, x1g)
    yc1 = jnp.minimum(y1, y1g)
    xc2 = jnp.maximum(x2, x2g)
    yc2 = jnp.maximum(y2, y2g)

    inter = jnp.where((yi2 > yi1) & (xi2 > xi1), (xi2 - xi1) * (yi2 - yi1), 0.0)
    union = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - inter + 1e-7
    iou = inter / union
    area_c = (xc2 - xc1) * (yc2 - yc1) + 1e-7
    return iou - (area_c - union) / area_c


def giou_loss(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean (1 - GIoU) loss (reference modules/loss/functional.py:158)."""
    return jnp.mean(1.0 - giou(output, target))


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """Center-format [cx, cy, w, h] -> [x1, y1, x2, y2]
    (reference utils/functional.py:18-26 'xywh2xyxy')."""
    c = boxes[..., :2]
    half = boxes[..., 2:4] / 2.0
    return jnp.concatenate([c - half, c + half], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """[x1, y1, x2, y2] -> center-format [cx, cy, w, h]
    (reference utils/functional.py:7-15 'xyxy2xywh')."""
    c = (boxes[..., :2] + boxes[..., 2:4]) / 2.0
    wh = boxes[..., 2:4] - boxes[..., :2]
    return jnp.concatenate([c, wh], axis=-1)


def scale_coords(img1_shape, coords, img0_shape):
    """Rescale xyxy coords from a letterboxed img1_shape back to
    img0_shape (reference utils/functional.py:29-36)."""
    gain = max(img1_shape) / max(img0_shape)
    pad_x = (img1_shape[1] - img0_shape[1] * gain) / 2
    pad_y = (img1_shape[0] - img0_shape[0] * gain) / 2
    out = jnp.stack([
        coords[..., 0] - pad_x, coords[..., 1] - pad_y,
        coords[..., 2] - pad_x, coords[..., 3] - pad_y], axis=-1)
    return jnp.maximum(out / gain, 0.0)
