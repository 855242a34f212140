"""Pallas TPU soft-NMS kernel.

The Bodla soft-NMS loop (select max -> decay overlaps -> drop below
threshold) is inherently sequential, which made it the reference's
wall-clock eval bottleneck (CPU Cython, quadratic —
ext/nms/nms/cpu_nms.pyx:17-120) and makes the pure-XLA formulation in
ops.nms pay per-step dispatch overhead (K fori_loop iterations, each a
handful of tiny HLO ops over (K,) vectors).

This kernel runs the whole loop inside ONE Pallas program: all state
(scores, active/selected flags, ranks) lives in VMEM/registers, each
iteration is a few VPU vector ops over a (8, K/8) tile, and the box
coordinates are kept transposed (4, K) so the IoU row against the
selected box is a pure lane-wise computation.

Semantics are identical to ops.nms.soft_nms (which is oracle-tested
against the Cython algorithm): +1 legacy extents, overlap-gated
threshold drop, per-class decay via class_ids.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_METHODS = {"linear": 1, "gaussian": 2, "hard": 0}
_NEG = -1e30


def _make_kernel(k: int, steps: int, method_id: int, sigma: float,
                 iou_threshold: float, score_threshold: float,
                 per_class: bool):
    def kernel(boxes_ref, scores_ref, valid_ref, cls_ref,
               out_scores_ref, selected_ref, rank_ref):
        # boxes_ref: (4, K) [x1, y1, x2, y2]; everything else (1, K).
        x1 = boxes_ref[0:1, :]
        y1 = boxes_ref[1:2, :]
        x2 = boxes_ref[2:3, :]
        y2 = boxes_ref[3:4, :]
        area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
        cls = cls_ref[0:1, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

        valid = valid_ref[0:1, :] > 0.0
        cur0 = jnp.where(valid, scores_ref[0:1, :], _NEG)

        def body(step, state):
            # flags carried as f32 vectors (Mosaic-friendly)
            cur, active_f, selected_f, rank = state
            active = active_f > 0.0
            selected = selected_f > 0.0
            cand = jnp.where(active & jnp.logical_not(selected), cur, _NEG)
            maxval = jnp.max(cand)
            any_left = maxval > _NEG
            # first lane attaining the max (vectorized argmax)
            is_max = cand >= maxval
            first = jnp.min(jnp.where(is_max, lane, k))
            is_m = (lane == first) & any_left
            selected = selected | is_m
            rank = jnp.where(is_m & (rank == k), step, rank)

            # IoU of box m against all boxes (legacy +1 extents)
            bx1 = jnp.sum(jnp.where(is_m, x1, 0.0))
            by1 = jnp.sum(jnp.where(is_m, y1, 0.0))
            bx2 = jnp.sum(jnp.where(is_m, x2, 0.0))
            by2 = jnp.sum(jnp.where(is_m, y2, 0.0))
            barea = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
            iw = jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1) + 1.0
            ih = jnp.minimum(by2, y2) - jnp.maximum(by1, y1) + 1.0
            overlap_pos = (iw > 0.0) & (ih > 0.0)
            inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
            ov = inter / jnp.maximum(barea + area - inter, 1e-12)
            ov = jnp.where(overlap_pos, ov, 0.0)
            if per_class:
                bcls = jnp.sum(jnp.where(is_m, cls, 0.0))
                same = cls == bcls
                ov = jnp.where(same, ov, 0.0)
                overlap_pos = overlap_pos & same

            if method_id == 1:       # linear
                wgt = jnp.where(ov > iou_threshold, 1.0 - ov, 1.0)
            elif method_id == 2:     # gaussian
                wgt = jnp.exp(-(ov * ov) / sigma)
            else:                    # hard
                wgt = jnp.where(ov > iou_threshold, 0.0, 1.0)

            decay = active & jnp.logical_not(selected) & any_left
            cur = jnp.where(decay, cur * wgt, cur)
            dropped = decay & overlap_pos & (cur < score_threshold)
            active = active & jnp.logical_not(dropped)
            return (cur, active.astype(jnp.float32),
                    selected.astype(jnp.float32), rank)

        init = (cur0, valid.astype(jnp.float32),
                jnp.zeros((1, k), jnp.float32),
                jnp.full((1, k), k, jnp.int32))
        cur, active_f, selected_f, rank = jax.lax.fori_loop(
            0, steps, body, init)
        out_scores_ref[0:1, :] = cur
        selected_ref[0:1, :] = selected_f
        rank_ref[0:1, :] = rank

    return kernel


@partial(jax.jit, static_argnames=("method", "max_out", "per_class",
                                   "sigma", "iou_threshold",
                                   "score_threshold", "interpret"))
def soft_nms_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    class_ids: Optional[jnp.ndarray] = None,
    sigma: float = 0.5,
    iou_threshold: float = 0.3,
    score_threshold: float = 0.001,
    method: str = "gaussian",
    max_out: Optional[int] = None,
    per_class: Optional[bool] = None,
    interpret: bool = False,
):
    """Drop-in replacement for ops.nms.soft_nms running as one Pallas
    program. Returns (new_scores, keep, rank) with identical semantics.

    boxes (K, 4) xyxy; K is padded internally to a multiple of 128.
    """
    k0 = boxes.shape[0]
    k = ((k0 + 127) // 128) * 128
    steps = k0 if max_out is None else min(max_out, k0)
    if per_class is None:
        per_class = class_ids is not None
    if valid is None:
        valid = jnp.ones((k0,), bool)
    if class_ids is None:
        class_ids = jnp.zeros((k0,), jnp.int32)

    pad = k - k0
    boxes_t = jnp.pad(boxes.astype(jnp.float32), ((0, pad), (0, 0))).T  # (4, K)
    scores_p = jnp.pad(scores.astype(jnp.float32), (0, pad))[None]
    valid_p = jnp.pad(valid.astype(jnp.float32), (0, pad))[None]
    cls_p = jnp.pad(class_ids.astype(jnp.float32), (0, pad))[None]

    kernel = _make_kernel(k, steps, _METHODS[method], sigma,
                          iou_threshold, score_threshold, per_class)
    out_scores, selected, rank = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(boxes_t, scores_p, valid_p, cls_p)

    return (out_scores[0, :k0], selected[0, :k0] > 0.5,
            jnp.where(rank[0, :k0] >= steps, k0, rank[0, :k0]))


def soft_nms_auto(*args, **kw):
    """Use the Pallas kernel on TPU, the XLA formulation elsewhere."""
    import jax as _jax
    from rrnet_tpu.ops import nms as _nms
    if _jax.default_backend() in ("tpu", "axon"):
        return soft_nms_pallas(*args, **kw)
    return _nms.soft_nms(*args, **kw)
