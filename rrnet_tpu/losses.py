"""Detection losses.

TPU-native equivalents of the reference's loss modules:
  * `focal_loss_hm`  <- modules/loss/functional.py:25-51 (CornerNet-style
    heatmap focal, (1-gt)^4 negative weighting, normalized by #pos),
  * `reg_l1_loss`    <- modules/loss/regl1loss.py:5-17 (masked L1 at GT
    center indices),
  * `focal_loss`     <- modules/loss/functional.py:6-22 (sigmoid focal for
    RetinaNet, alpha=0.75 gamma=2, sum reduction),
  * `smooth_l1_loss` <- torch.nn.functional.smooth_l1_loss (beta=1),
  * `giou_loss`      re-exported from ops.box.

All functions are pure jnp; layouts are NHWC ((B, H, W, C) maps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rrnet_tpu.ops.box import giou_loss  # noqa: F401  (re-export)


def clamped_sigmoid(logits: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """sigmoid clamped to [eps, 1-eps] — the operators clamp before the
    heatmap focal loss (operators/rrnet_operator.py:55)."""
    return jnp.clip(jax.nn.sigmoid(logits), eps, 1.0 - eps)


def focal_loss_hm(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """CornerNet / CenterNet heatmap focal loss.

    pred: (B, H, W, C) probabilities (already sigmoided + clamped),
    gt:   (B, H, W, C) gaussian target heatmap.

    Positives are pixels with gt == 1; negatives are weighted (1-gt)^4;
    loss is normalized by the positive count, or is the raw negative sum
    when there are no positives (functional.py:25-51).
    """
    pos = (gt == 1.0).astype(pred.dtype)
    neg = 1.0 - pos
    neg_weights = jnp.power(1.0 - gt, 4)

    pos_loss = jnp.sum(jnp.log(pred) * jnp.power(1.0 - pred, 2) * pos)
    neg_loss = jnp.sum(jnp.log(1.0 - pred) * jnp.power(pred, 2) * neg_weights * neg)
    num_pos = jnp.sum(pos)

    return jnp.where(
        num_pos == 0,
        -neg_loss,
        -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0),
    )


def focal_loss_hm_from_logits(logits: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return focal_loss_hm(clamped_sigmoid(logits), gt)


def reg_l1_loss(pred_map: jnp.ndarray, mask: jnp.ndarray, ind: jnp.ndarray,
                target: jnp.ndarray) -> jnp.ndarray:
    """Masked L1 at GT center indices.

    pred_map: (B, H, W, C) regression map (C=2 for wh/offset),
    mask:     (B, N) or (B, N, 1) slot validity,
    ind:      (B, N) int flat y*W+x indices,
    target:   (B, N, C).

    Matches reference RegL1Loss (regl1loss.py:9-17): gather, multiply both
    sides by the mask broadcast over channels, sum-L1, divide by the
    broadcast mask sum (+1e-4) — i.e. the denominator counts positives
    times C, exactly as torch's expand_as does.
    """
    b, h, w, c = pred_map.shape
    pred = jnp.take_along_axis(
        pred_map.reshape(b, h * w, c), ind[..., None].astype(jnp.int32), axis=1
    )  # (B, N, C)
    if mask.ndim == 2:
        mask = mask[..., None]
    m = jnp.broadcast_to(mask.astype(pred.dtype), pred.shape)
    loss = jnp.sum(jnp.abs(pred * m - target * m))
    return loss / (jnp.sum(m) + 1e-4)


def focal_loss(cls_logits: jnp.ndarray, cls_targets: jnp.ndarray,
               gamma: float = 2.0, alpha: float = 0.75,
               reduction: str = "sum") -> jnp.ndarray:
    """Sigmoid focal loss for RetinaNet.

    cls_logits: (..., num_classes) logits; cls_targets: same shape with
    values in {1 (pos), 0 (neg)}. Ignored anchors are handled by the
    caller masking the elementwise (reduction='none') output — the
    reference slices valid anchors before summing
    (operators/retinanet_operator.py:64-72).
    Matches modules/loss/functional.py:6-22 (probabilities clamped 1e-7).
    """
    p = jnp.clip(jax.nn.sigmoid(cls_logits), 1e-7, 1.0 - 1e-7)
    is_pos = cls_targets == 1.0
    alpha_factor = jnp.where(is_pos, alpha, 1.0 - alpha)
    focal_weight = jnp.where(is_pos, 1.0 - p, p)
    focal_weight = alpha_factor * jnp.power(focal_weight, gamma)
    bce = -(cls_targets * jnp.log(p) + (1.0 - cls_targets) * jnp.log(1.0 - p))
    out = focal_weight * bce
    return jnp.sum(out) if reduction == "sum" else out


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   beta: float = 1.0, reduction: str = "mean") -> jnp.ndarray:
    """Huber / smooth-L1 matching torch.nn.functional.smooth_l1_loss."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def kl_feature_loss(small_alpha, large_alpha, small_feats, large_feats):
    """Heteroscedastic feature-distillation loss core (reference
    modules/loss/functional.py:106-108). The reference keeps this as an
    unused experiment (KLLoss); provided for completeness. Inputs are the
    gathered projected/original features for small/large object sets;
    `large_*` should be stop-gradiented by the caller."""
    sl1 = smooth_l1_loss(small_feats, large_feats, reduction="none")
    loss = 0.5 * (small_alpha - large_alpha) + \
        (jnp.exp(large_alpha) + sl1) / (2.0 * jnp.exp(small_alpha))
    return jnp.mean(loss)
