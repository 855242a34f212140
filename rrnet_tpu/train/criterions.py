"""Loss criterions per detector family — fully vectorized device code
replacing the reference operators' per-image Python loops.

  * centernet_criterion <- operators/centernet_operator.py:40-56
  * rrnet_criterion     <- operators/rrnet_operator.py:42-102 (stage-1
    CenterNet losses per stack + stage-2 smooth-L1 on Faster-RCNN deltas
    for ROIs with IoU > 0.5, batch loop vectorized via masking)
  * retinanet_criterion <- operators/retinanet_operator.py:47-113
    (IoU >= 0.5 pos / < 0.4 neg assignment, focal normalized by #pos,
    smooth-L1 beta=1/9 on standardized deltas)

Targets for the CenterNet family are rendered on device
(ops.targets.render_batch) from the padded (B, N, 8) annotation tensor —
the reference rendered them on CPU in dataloader workers.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from rrnet_tpu import losses
from rrnet_tpu.ops import box as boxops
from rrnet_tpu.ops.targets import render_batch


def centernet_targets(annos, valid, feat_shape, scale_factor, num_classes):
    return render_batch(annos, valid, feat_shape=feat_shape,
                        scale_factor=scale_factor, num_classes=num_classes)


def centernet_criterion(hms, whs, offsets, targets) -> Dict[str, jnp.ndarray]:
    """Per-stack focal-hm + 0.1*L1(wh) + L1(offset); each stack's term
    divided by num_stacks (centernet_operator.py:45-56)."""
    num_stacks = len(hms)
    hm_loss = wh_loss = off_loss = 0.0
    for s in range(num_stacks):
        pred_hm = losses.clamped_sigmoid(hms[s].astype(jnp.float32))
        hm_loss += losses.focal_loss_hm(pred_hm, targets.hm) / num_stacks
        wh_loss += losses.reg_l1_loss(whs[s].astype(jnp.float32),
                                      targets.reg_mask, targets.ind,
                                      targets.wh) / num_stacks
        off_loss += losses.reg_l1_loss(offsets[s].astype(jnp.float32),
                                       targets.reg_mask, targets.ind,
                                       targets.offset) / num_stacks
    return {"hm": hm_loss, "wh": wh_loss, "off": off_loss}


def rrnet_stage2_criterion(outs, annos, valid, scale_factor: int) -> jnp.ndarray:
    """Stage-2 smooth-L1 (rrnet_operator.py:63-102), vectorized.

    For each ROI (stage-1 box in feature coords): scale to input coords,
    match to the max-IoU GT; positives are IoU > 0.5. Per image the loss
    is the mean smooth-L1 over positive ROIs (zero when none), averaged
    over the batch.
    """
    rois_in = outs.rois * scale_factor                       # (B, R, 4) xyxy
    gt_xyxy = boxops.xywh_to_xyxy(annos[..., :4])            # (B, N, 4)

    iou = jax.vmap(boxops.pairwise_iou)(rois_in, gt_xyxy)    # (B, R, N)
    iou = jnp.where(valid[:, None, :], iou, 0.0)
    max_iou = jnp.max(iou, axis=-1)                          # (B, R)
    max_idx = jnp.argmax(iou, axis=-1)                       # (B, R)
    pos = (max_iou > 0.5) & outs.roi_valid                   # (B, R)

    matched_gt = jnp.take_along_axis(gt_xyxy, max_idx[..., None], axis=1)
    target = boxops.encode_boxes(rois_in, matched_gt)        # (B, R, 4)

    elem = losses.smooth_l1_loss(outs.stage2_reg.astype(jnp.float32),
                                 jax.lax.stop_gradient(target),
                                 reduction="none")           # (B, R, 4)
    per_img_sum = jnp.sum(elem * pos[..., None], axis=(1, 2))
    n_pos = jnp.sum(pos, axis=1)
    per_img = jnp.where(n_pos > 0,
                        per_img_sum / jnp.maximum(n_pos * 4, 1), 0.0)
    return jnp.mean(per_img)


def retinanet_criterion(loc_preds, cls_preds, annos, valid, anchors,
                        pos_iou: float = 0.5, neg_iou: float = 0.4,
                        alpha: float = 0.75, gamma: float = 2.0
                        ) -> Dict[str, jnp.ndarray]:
    """Anchor assignment + focal + smooth-L1(beta=1/9), vectorized over
    the batch (retinanet_operator.py:47-113)."""
    gt_xyxy = boxops.xywh_to_xyxy(annos[..., :4])            # (B, N, 4)
    num_classes = cls_preds.shape[-1]

    def one(loc_p, cls_p, gt, gt_cls, ok):
        iou = boxops.pairwise_iou(gt, anchors)               # (N, A)
        iou = jnp.where(ok[:, None], iou, 0.0)
        max_iou = jnp.max(iou, axis=0)                       # (A,)
        max_idx = jnp.argmax(iou, axis=0)                    # (A,)
        pos = max_iou >= pos_iou
        neg = max_iou < neg_iou
        sel = pos | neg

        a_cls = jnp.clip(gt_cls[max_idx].astype(jnp.int32) - 1, 0,
                         num_classes - 1)
        cls_t = jax.nn.one_hot(a_cls, num_classes) * pos[:, None]
        cls_elem = losses.focal_loss(cls_p.astype(jnp.float32), cls_t,
                                     gamma=gamma, alpha=alpha,
                                     reduction="none")
        n_pos = jnp.sum(pos)
        cls_loss = jnp.sum(cls_elem * sel[:, None]) / jnp.maximum(n_pos, 1.0)

        # regression targets (standardized deltas; gt wh clamped >= 1)
        aw = anchors[:, 2] - anchors[:, 0]
        ah = anchors[:, 3] - anchors[:, 1]
        acx = anchors[:, 0] + 0.5 * aw
        acy = anchors[:, 1] + 0.5 * ah
        g = gt[max_idx]
        gw = jnp.maximum(g[:, 2] - g[:, 0], 1.0)
        gh = jnp.maximum(g[:, 3] - g[:, 1], 1.0)
        gcx = g[:, 0] + 0.5 * (g[:, 2] - g[:, 0])
        gcy = g[:, 1] + 0.5 * (g[:, 3] - g[:, 1])
        t = jnp.stack([(gcx - acx) / aw, (gcy - acy) / ah,
                       jnp.log(gw / aw), jnp.log(gh / ah)], axis=1)
        t = t / jnp.asarray([[0.1, 0.1, 0.2, 0.2]])
        diff = jnp.abs(jax.lax.stop_gradient(t) - loc_p.astype(jnp.float32))
        elem = jnp.where(diff <= 1.0 / 9.0, 0.5 * 9.0 * diff * diff,
                         diff - 0.5 / 9.0)
        reg_loss = jnp.where(
            n_pos > 0,
            jnp.sum(elem * pos[:, None]) / jnp.maximum(n_pos * 4, 1.0),
            0.0)
        return cls_loss, reg_loss

    cls_l, reg_l = jax.vmap(one)(loc_preds, cls_preds, gt_xyxy,
                                 annos[..., 5], valid)
    return {"cls": jnp.mean(cls_l), "reg": jnp.mean(reg_l)}
