"""Config -> model factory."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from rrnet_tpu.config import Config


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def build_model(cfg: Config, bn_axis: Optional[str] = None):
    """Instantiate the configured detector. `bn_axis` overrides the mesh
    axis used for cross-replica BN (None disables SyncBN; pass the data
    axis name when calling inside shard_map with cfg.model.sync_bn)."""
    m = cfg.model
    dtype = _dtype(m.dtype)
    axis = bn_axis if m.sync_bn else None

    if m.name == "centernet":
        from rrnet_tpu.models.centernet import CenterNet
        return CenterNet(num_classes=cfg.num_classes, num_stacks=m.num_stacks,
                         backbone=m.backbone, wh_kernel=m.wh_kernel,
                         bn_axis=axis, dtype=dtype)
    if m.name == "rrnet":
        from rrnet_tpu.models.rrnet import RRNet
        return RRNet(num_classes=cfg.num_classes, num_stacks=m.num_stacks,
                     backbone=m.backbone, wh_kernel=m.wh_kernel,
                     topk=m.topk, stage2_rois=m.stage2_rois,
                     nms_type=m.nms_type_for_stage1,
                     nms_per_class=m.nms_per_class_for_stage1,
                     nms_iou=m.stage1_nms_iou,
                     soft_nms_sigma=m.soft_nms.sigma,
                     soft_nms_score_threshold=m.soft_nms.score_threshold,
                     with_attention=m.with_self_attention,
                     bn_axis=axis, dtype=dtype)
    if m.name == "retinanet":
        from rrnet_tpu.models.retinanet import RetinaNet
        num_anchors = len(m.anchor_ratios) * len(m.anchor_scales)
        return RetinaNet(num_classes=cfg.num_classes, num_anchors=num_anchors,
                         backbone=m.backbone, fpn_channels=m.fpn_channels,
                         bn_axis=axis, dtype=dtype)
    raise ValueError(f"unknown model {m.name!r}")
