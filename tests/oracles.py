"""Pure-numpy reference oracles for kernel tests.

These re-derive the published algorithms the reference's native
extensions implement (greedy NMS; Bodla et al. soft-NMS; CornerNet
gaussian target rendering) so device kernels can be checked for exact
behavioural parity. They intentionally use the same conventions as the
reference (legacy +1 box extents for the NMS family, floored centers and
radius-box windows for the gaussian renderer).
"""

from __future__ import annotations

import numpy as np


def np_hard_nms(boxes, scores, iou_threshold, plus_one=False, suppress_equal=False):
    """Greedy hard NMS. Returns sorted indices of kept boxes (original
    indexing), highest score first."""
    off = 1.0 if plus_one else 0.0
    order = np.argsort(-scores, kind="stable")
    areas = (boxes[:, 2] - boxes[:, 0] + off) * (boxes[:, 3] - boxes[:, 1] + off)
    suppressed = np.zeros(len(boxes), dtype=bool)
    keep = []
    for _i, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order[_i + 1:]:
            if suppressed[j]:
                continue
            iw = min(boxes[i, 2], boxes[j, 2]) - max(boxes[i, 0], boxes[j, 0]) + off
            ih = min(boxes[i, 3], boxes[j, 3]) - max(boxes[i, 1], boxes[j, 1]) + off
            inter = max(iw, 0.0) * max(ih, 0.0)
            iou = inter / (areas[i] + areas[j] - inter)
            if (iou >= iou_threshold) if suppress_equal else (iou > iou_threshold):
                suppressed[j] = True
    return np.array(keep, dtype=np.int64)


def np_soft_nms(boxes, scores, sigma=0.5, iou_threshold=0.3,
                score_threshold=0.001, method="gaussian"):
    """Soft-NMS (Bodla et al.) with the reference's conventions: +1 box
    extents, decay only of not-yet-selected boxes, discard below the score
    threshold.

    Returns (kept_indices_in_selection_order, final_scores) where
    final_scores is indexed by original box index.
    """
    n = len(boxes)
    cur = scores.astype(np.float32).copy()
    active = np.ones(n, dtype=bool)
    selected = np.zeros(n, dtype=bool)
    order = []
    areas = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)

    while True:
        cand = np.where(active & ~selected, cur, -np.inf)
        m = int(np.argmax(cand))
        if cand[m] == -np.inf:
            break
        selected[m] = True
        order.append(m)
        for j in range(n):
            if not active[j] or selected[j]:
                continue
            iw = min(boxes[m, 2], boxes[j, 2]) - max(boxes[m, 0], boxes[j, 0]) + 1.0
            ih = min(boxes[m, 3], boxes[j, 3]) - max(boxes[m, 1], boxes[j, 1]) + 1.0
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            ov = inter / (areas[m] + areas[j] - inter)
            ov = np.float32(ov)
            if method == "linear":
                w = np.float32(1.0) - ov if ov > iou_threshold else np.float32(1.0)
            elif method == "gaussian":
                w = np.exp(np.float32(-(ov * ov) / sigma))
            else:
                w = np.float32(0.0) if ov > iou_threshold else np.float32(1.0)
            cur[j] = np.float32(cur[j] * w)
            if cur[j] < score_threshold:
                active[j] = False
    return np.array(order, dtype=np.int64), cur


def np_gaussian_radius(height, width, min_overlap=0.7):
    h, w = float(height), float(width)
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + np.sqrt(max(b1 * b1 - 4 * c1, 0.0))) / 2.0
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 + np.sqrt(max(b2 * b2 - 16 * c2, 0.0))) / 2.0
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (b3 + np.sqrt(max(b3 * b3 - 4 * a3 * c3, 0.0))) / 2.0
    return min(r1, r2, r3)


def np_render_targets(annos, valid, feat_hw, scale_factor=4, num_classes=10):
    """Numpy oracle of CenterNet target rendering (per-object gaussian
    splats with max compositing, floored centers, radius-box windows)."""
    fh, fw = feat_hw
    hm = np.zeros((fh, fw, num_classes), dtype=np.float64)
    n = annos.shape[0]
    wh = np.zeros((n, 2))
    ind = np.zeros((n,), dtype=np.int64)
    offset = np.zeros((n, 2))
    reg_mask = np.zeros((n,))

    for i in range(n):
        x, y, w, h = annos[i, :4] / scale_factor * np.array([1, 1, 1, 1])
        x1, y1 = annos[i, 0] / scale_factor, annos[i, 1] / scale_factor
        x2 = (annos[i, 0] + annos[i, 2]) / scale_factor
        y2 = (annos[i, 1] + annos[i, 3]) / scale_factor
        bw, bh = x2 - x1, y2 - y1
        wh[i] = (bw, bh)
        cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        cxi, cyi = np.floor(cx), np.floor(cy)
        offset[i] = (cx - cxi, cy - cyi)
        ind[i] = min(max(int(cyi * fw + cxi), 0), fh * fw - 1)
        ok = bool(valid[i]) and bw > 0 and bh > 0
        reg_mask[i] = float(ok)
        if not ok:
            continue
        r = max(np.floor(np_gaussian_radius(np.ceil(bh), np.ceil(bw))), 0.0)
        sigma = (2 * r + 1) / 6.0
        cls = int(annos[i, 5]) - 1
        for py in range(fh):
            for px in range(fw):
                dx, dy = px - cxi, py - cyi
                if abs(dx) <= r and abs(dy) <= r:
                    g = np.exp(-(dx * dx + dy * dy) / (2 * sigma * sigma))
                    hm[py, px, cls] = max(hm[py, px, cls], g)
    return hm, wh, ind, offset, reg_mask
