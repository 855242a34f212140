"""RRNet — hybrid two-stage detector (reference models/rrnet.py:11-157).

Stage 1: stacked-hourglass CenterNet (heatmap / asymmetric-wh / offset
heads per stack). The last stack's heads are decoded to top-k candidate
boxes and NMS'd *on device* (the reference round-trips to CPU Cython
soft-NMS per image per class, models/rrnet.py:56-80 — here it is a
fixed-K masked kernel). Stage 2: a static budget of R ROIs per image is
ROI-aligned (3x3) from the last stack's feature map and re-regressed by
a small bottleneck head (FasterRCNNDetector).

All stage-2 shapes are static: (B, R) boxes with a validity mask replace
the reference's dynamic per-image ROI concat (models/rrnet.py:37-51).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rrnet_tpu.models.backbones import get_backbone
from rrnet_tpu.models.heads import CenterNetHead, CenterNetWHHead, FasterRCNNHead
from rrnet_tpu.ops.heatmap import topk_decode
from rrnet_tpu.ops.nms import hard_nms, soft_nms
from rrnet_tpu.ops.roi_align import roi_align


def mask_heatmap_extent(hm, valid_hw, scale_factor: int = 4):
    """Set heatmap logits outside each image's valid stride-s extent to
    a large negative so padded bucket area never produces detections.
    hm: (B, H, W, C); valid_hw: (B, 2) int32 image-pixel extents."""
    b, h, w, _ = hm.shape
    fy = jnp.ceil(valid_hw[:, 0] / scale_factor)[:, None, None]
    fx = jnp.ceil(valid_hw[:, 1] / scale_factor)[:, None, None]
    ys = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    ok = (ys < fy) & (xs < fx)
    return jnp.where(ok[..., None], hm, -1e9)


class RRNetOutputs(NamedTuple):
    hms: tuple          # per-stack (B, H, W, C) heatmap logits
    whs: tuple          # per-stack (B, H, W, 2)
    offsets: tuple      # per-stack (B, H, W, 2)
    stage2_reg: jnp.ndarray   # (B, R, 4) regression deltas
    rois: jnp.ndarray         # (B, R, 4) xyxy in stride-4 feature coords
    roi_scores: jnp.ndarray   # (B, R) stage-1 scores (post NMS decay)
    roi_classes: jnp.ndarray  # (B, R) int32 0-based classes
    roi_valid: jnp.ndarray    # (B, R) bool


class RRNet(nn.Module):
    num_classes: int = 10
    num_stacks: int = 2
    backbone: str = "hourglass"
    wh_kernel: int = 17
    topk: int = 1500
    stage2_rois: int = 512
    nms_type: str = "nms"            # 'nms' | 'soft_nms' (stage-1)
    nms_per_class: bool = True
    nms_iou: float = 0.7
    soft_nms_sigma: float = 0.5
    soft_nms_score_threshold: float = 0.1
    # Optional local windowed self-attention on each stack feature
    # (residual, zero-init output proj). The reference defines
    # SelfAttentionModule but never wires it (modules/self_attention.py,
    # SURVEY §2); this flag realizes the 'rrnet_hrnetv2_attention'
    # configuration. Window params follow the module's own example
    # (self_attention.py:97-102).
    with_attention: bool = False
    attention_kernel: int = 5
    attention_dilation: int = 6
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw=None,
                 roi_jitter=None) -> RRNetOutputs:
        """valid_hw: optional (B, 2) int32 [h, w] image extents; when the
        batch is padded to a shape bucket (multi-scale eval), heatmap
        logits outside the valid stride-4 extent are masked before
        decoding so padding cannot emit detections.

        roi_jitter: optional (B, R, 4) additive offsets (feature coords)
        applied to the selected stage-1 ROIs before ROI-align/stage-2 —
        the coarse-ROI ablation: on VisDrone-like data stage-1 boxes
        err by multiple feature pixels, which is the regime the stage-2
        re-regression exists for (rrnet_operator.py:63-102); jittering
        at eval reproduces that regime on easy data so the gate can
        measure whether stage 2 undoes known box noise. Eval-only."""
        # I. Backbone (one 256-ch stride-4 map per stack).
        feats = get_backbone(self.backbone, self.num_stacks, self.bn_axis,
                             self.dtype)(x, train)

        # II. Stage-1 heads per stack.
        hm_head = CenterNetHead(self.num_classes, num_stacks=self.num_stacks,
                                is_heatmap=True, dtype=self.dtype, name="hm")
        wh_head = CenterNetWHHead(1, num_stacks=self.num_stacks,
                                  kernel=self.wh_kernel, dtype=self.dtype,
                                  name="wh")
        off_head = CenterNetHead(2, num_stacks=self.num_stacks,
                                 dtype=self.dtype, name="offset")
        hms, whs, offsets = [], [], []
        for i in range(self.num_stacks):
            f = nn.relu(feats[i])
            if self.with_attention:
                from rrnet_tpu.models.modules import SelfAttentionModule
                pad = self.attention_dilation * (self.attention_kernel // 2)
                f = f + SelfAttentionModule(
                    key_channels=64, value_channels=64,
                    kernel_size=self.attention_kernel,
                    dilation=self.attention_dilation, padding=pad,
                    bn_axis=self.bn_axis, dtype=self.dtype,
                    name=f"attention{i}")(f, train)
            hms.append(hm_head(f, i))
            whs.append(wh_head(f, i))
            offsets.append(off_head(f, i))

        # III. Decode top-k candidates from the LAST stack (feature coords).
        hm_last = hms[-1].astype(jnp.float32)
        if valid_hw is not None:
            hm_last = mask_heatmap_extent(hm_last, valid_hw, scale_factor=4)
        dets = topk_decode(
            hm_last, whs[-1].astype(jnp.float32),
            offsets[-1].astype(jnp.float32), k=self.topk)

        # IV. Per-image NMS + static top-R ROI budget.
        r = self.stage2_rois

        def select_rois(boxes, scores, classes):
            cls_ids = classes if self.nms_per_class else None
            if self.nms_type == "soft_nms":
                # chunked serial Pallas kernel on TPU, XLA fori-loop
                # elsewhere. (The class-parallel rows kernel exists but
                # is opt-in via class_parallel=True: at this shape the
                # serial kernel wins 0.63 vs 4.25 ms/img — NMS_BENCH)
                from rrnet_tpu.ops.pallas_nms import soft_nms_auto
                new_scores, keep, _ = soft_nms_auto(
                    boxes, scores, class_ids=cls_ids,
                    num_classes=self.num_classes,
                    sigma=self.soft_nms_sigma,
                    iou_threshold=self.nms_iou,
                    score_threshold=self.soft_nms_score_threshold,
                    method="gaussian", max_out=r)
                masked = jnp.where(keep, new_scores, -jnp.inf)
            else:
                keep = hard_nms(boxes, scores, self.nms_iou,
                                class_ids=cls_ids)
                masked = jnp.where(keep, scores, -jnp.inf)
            top_scores, idx = jax.lax.top_k(masked, r)
            valid = top_scores > -jnp.inf
            return (boxes[idx], jnp.where(valid, top_scores, 0.0),
                    classes[idx], valid)

        rois, roi_scores, roi_classes, roi_valid = jax.vmap(select_rois)(
            dets.boxes, dets.scores, dets.classes)
        if roi_jitter is not None:
            rois = rois + roi_jitter.astype(rois.dtype)

        # V. Stage 2: ROI-align over relu(last feat), bottleneck regressor.
        # Train keeps the f32 cast so the backward scatter-add through
        # the ROI gathers accumulates in f32; at eval the gather runs on
        # the native (bf16) features — bit-identical output (the op
        # converts the gathered corners to f32 before interpolating) at
        # half the gather traffic.
        last_feat = nn.relu(feats[-1])
        if train:
            last_feat = last_feat.astype(jnp.float32)
        roi_feat = jax.vmap(
            lambda f, b: roi_align(f, b, output_size=(3, 3))
        )(last_feat, rois)                                  # (B, R, 3, 3, C)
        b = roi_feat.shape[0]
        c = roi_feat.shape[-1]
        flat = roi_feat.reshape(b * r, 3, 3, c)
        s2 = FasterRCNNHead(bn_axis=self.bn_axis, dtype=self.dtype,
                            name="head_detector")(flat, train)
        stage2_reg = s2.reshape(b, r, 4)

        return RRNetOutputs(
            hms=tuple(hms), whs=tuple(whs), offsets=tuple(offsets),
            stage2_reg=stage2_reg, rois=rois, roi_scores=roi_scores,
            roi_classes=roi_classes, roi_valid=roi_valid)
