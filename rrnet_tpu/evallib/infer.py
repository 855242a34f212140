"""Multi-scale (+ flip-TTA) inference driver with shape bucketing.

Rebuilds the reference eval loops (operators/rrnet_operator.py:246-284,
operators/centernet_operator.py:251-297) TPU-first:

  * The reference feeds every scaled image at its exact dynamic shape
    (one CUDA graph per size, fine on GPU). XLA compiles per shape, so
    each scaled image is right/bottom-padded into a shape BUCKET
    (multiple of `bucket_multiple` pixels). Buckets are cached: the
    whole VisDrone val set at 6 scales compiles a handful of programs.
  * Padded area is masked out of the heatmap before top-k so it cannot
    emit detections.
  * Per-image post-processing (score filter, multi-scale merge, optional
    per-class soft-NMS, txt writing) stays on host, via the native
    host_nms library.

CenterNet eval additionally runs horizontal-flip TTA per scale
(centernet_operator.py:266-283) and decodes only the LAST stack.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from rrnet_tpu.config import Config
from rrnet_tpu.evallib import host_nms
from rrnet_tpu.evallib.writer import save_result
from rrnet_tpu.models import build_model
from rrnet_tpu.models.rrnet import mask_heatmap_extent
from rrnet_tpu.ops.box import decode_boxes
from rrnet_tpu.ops.heatmap import topk_decode


def _bucket(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


class Evaluator:
    """Runs a trained model over full images and produces (N, 6)
    [x, y, w, h, score, cls(1-based)] detections in original pixels."""

    def __init__(self, cfg: Config, variables, model=None,
                 bucket_multiple: int = 128, decode_topk: int = 250):
        self.cfg = cfg
        self.model = model if model is not None else build_model(cfg)
        self.variables = variables
        self.bucket_multiple = bucket_multiple
        self.decode_topk = decode_topk
        self._compiled: Dict[Tuple[int, int], callable] = {}

    # ------------------------------------------------------------------
    def _predict_fn(self, shape: Tuple[int, int]):
        """Build/jit the per-bucket predict function."""
        if shape in self._compiled:
            return self._compiled[shape]

        name = self.cfg.model.name
        model = self.model
        k = self.decode_topk
        s = self.cfg.train.scale_factor

        if name == "rrnet":
            @jax.jit
            def fn(variables, img, valid_hw):
                outs = model.apply(variables, img, train=False,
                                   valid_hw=valid_hw)
                # generate_bbox (rrnet_operator.py:188-209): stage-1 rois
                # scaled to input pixels, stage-2 deltas applied
                rois_xyxy = outs.rois * s
                rois_xywh = jnp.concatenate(
                    [rois_xyxy[..., :2],
                     rois_xyxy[..., 2:4] - rois_xyxy[..., :2]], -1)
                s2_xywh = decode_boxes(rois_xywh, outs.stage2_reg)
                return (s2_xywh, outs.roi_scores,
                        outs.roi_classes.astype(jnp.float32) + 1.0,
                        outs.roi_valid)
        else:   # centernet family: decode last stack, k=250
            @jax.jit
            def fn(variables, img, valid_hw):
                hms, whs, regs = model.apply(variables, img, train=False)
                hm = mask_heatmap_extent(hms[-1].astype(jnp.float32),
                                         valid_hw, s)
                dets = topk_decode(hm, whs[-1].astype(jnp.float32),
                                   regs[-1].astype(jnp.float32),
                                   k=k, scale_factor=float(s))
                xywh = jnp.concatenate(
                    [dets.boxes[..., :2],
                     dets.boxes[..., 2:4] - dets.boxes[..., :2]], -1)
                valid = dets.scores > 0
                return (xywh, dets.scores,
                        dets.classes.astype(jnp.float32) + 1.0, valid)

        self._compiled[shape] = fn
        return fn

    # ------------------------------------------------------------------
    def _run_scale(self, image: np.ndarray, scale: float,
                   flip: bool = False) -> np.ndarray:
        """One (scale, flip) pass -> (M, 6) xywh rows in ORIGINAL pixels."""
        h, w = image.shape[:2]
        if scale != 1.0:
            img = cv2.resize(image, (int(w * scale), int(h * scale)),
                             interpolation=cv2.INTER_LINEAR)
        else:
            img = image
        sh, sw = img.shape[:2]
        if flip:
            img = img[:, ::-1]
        bh, bw = _bucket(sh, self.bucket_multiple), _bucket(sw, self.bucket_multiple)
        padded = np.zeros((bh, bw, 3), np.float32)
        padded[:sh, :sw] = img
        fn = self._predict_fn((bh, bw))
        xywh, scores, classes, valid = fn(
            self.variables, jnp.asarray(padded[None]),
            jnp.asarray([[sh, sw]], jnp.int32))
        xywh = np.asarray(xywh[0], np.float64)
        scores = np.asarray(scores[0], np.float64)
        classes = np.asarray(classes[0], np.float64)
        valid = np.asarray(valid[0])

        rows = np.concatenate(
            [xywh, scores[:, None], classes[:, None]], axis=1)[valid]
        if flip:
            rows[:, 0] = sw - rows[:, 0] - rows[:, 2]
        rows[:, :4] /= scale
        return rows

    # ------------------------------------------------------------------
    def predict(self, image: np.ndarray) -> np.ndarray:
        """Full multi-scale (+flip) prediction for one normalized image.
        Returns (N, 6) rows sorted by score desc; soft-NMS applied when
        auto_test is off (the auto-eval grid applies it offline)."""
        cfg = self.cfg
        parts: List[np.ndarray] = []
        for scale in cfg.val.scales:
            if cfg.val.flip_tta:
                parts.append(self._run_scale(image, scale, flip=True))
            parts.append(self._run_scale(image, scale, flip=False))
        pred = np.concatenate(parts, axis=0)
        if not cfg.val.auto_test:
            pred = pred[pred[:, 4] > cfg.val.score_threshold]
        pred = pred[np.argsort(-pred[:, 4], kind="stable")]
        if not cfg.val.auto_test:
            pred = host_nms.per_class_soft_nms_xywh(
                pred, Nt=cfg.model.soft_nms.iou_threshold,
                threshold=cfg.model.soft_nms.score_threshold)
            pred = pred[np.argsort(-pred[:, 4], kind="stable")]
        return pred

    # ------------------------------------------------------------------
    def evaluate_split(self, loader, result_dir: Optional[str] = None,
                       max_images: Optional[int] = None,
                       verbose: bool = True) -> str:
        """Run the val split, writing VisDrone txts (the reference's
        evaluation_process). Returns the result dir."""
        result_dir = result_dir or self.cfg.val.result_dir
        os.makedirs(result_dir, exist_ok=True)
        style = ("centernet" if self.cfg.model.name == "centernet"
                 else "rrnet")
        for i, item in enumerate(loader):
            if max_images is not None and i >= max_images:
                break
            pred = self.predict(item["image"])
            save_result(os.path.join(result_dir, item["name"] + ".txt"),
                        pred, style=style)
            if verbose:
                print(f"\r[{i + 1}]", end="", flush=True)
        if verbose:
            print("\n=> Evaluation Done!")
        return result_dir
