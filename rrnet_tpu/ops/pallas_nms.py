"""Pallas TPU soft-NMS kernel.

The Bodla soft-NMS loop (select max -> decay overlaps -> drop below
threshold) is inherently sequential, which made it the reference's
wall-clock eval bottleneck (CPU Cython, quadratic —
ext/nms/nms/cpu_nms.pyx:17-120) and makes the pure-XLA formulation in
ops.nms pay per-step dispatch overhead (K fori_loop iterations, each a
handful of tiny HLO ops over (K,) vectors).

This kernel runs the whole loop inside ONE Pallas program with all
state resident in VMEM. Two things make it fast on the VPU:

  * full-tile state: every per-box vector lives as an (8, K/8) tile,
    so each elementwise op uses all 8 sublanes x 128 lanes of the VPU.
    (The r3 version kept state as (1, K) rows — 1/8 sublane
    utilization.)
  * fori_loop selection: `max_out` bounds the iteration count; an
    early-exit while_loop would be the natural next step, but Mosaic
    on this backend hangs compiling scf.while (minimal repro: any
    lax.while_loop inside pallas_call), so the loop is a fixed-trip
    fori with all work masked once candidates run out.

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


def _make_kernel(rows: int, cols: int, steps: int, method_id: int,
                 sigma: float, iou_threshold: float, score_threshold: float,
                 per_class: bool):
    def kernel(boxes_ref, scores_ref, valid_ref, cls_ref,
               out_scores_ref, selected_ref, rank_ref):
        # boxes_ref: (4, rows, cols) [x1, y1, x2, y2]; the rest
        # (rows, cols) — the padded (K,) vector reshaped row-major.
        x1 = boxes_ref[0]
        y1 = boxes_ref[1]
        x2 = boxes_ref[2]
        y2 = boxes_ref[3]
        area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
        cls = cls_ref[...]
        k = rows * cols
        # linear index of each slot under the row-major (K,) layout
        idx = (jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) * cols +
               jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1))

        valid = valid_ref[...] > 0.0
        cur0 = jnp.where(valid, scores_ref[...], _NEG)

        def body(step, state):
            # flags carried as f32 tiles (Mosaic-friendly)
            cur, active_f, selected_f, rank = state
            active = active_f > 0.0
            selected = selected_f > 0.0
            cand = jnp.where(active & jnp.logical_not(selected), cur, _NEG)
            maxval = jnp.max(cand)
            any_left = maxval > _NEG
            # first slot attaining the max (vectorized argmax)
            is_max = cand >= maxval
            first = jnp.min(jnp.where(is_max, idx, k))
            is_m = (idx == first) & any_left
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
                jnp.zeros((rows, cols), jnp.float32),
                jnp.full((rows, cols), k, jnp.int32))
        cur, active_f, selected_f, rank = jax.lax.fori_loop(
            0, steps, body, init)
        out_scores_ref[...] = cur
        selected_ref[...] = selected_f
        rank_ref[...] = rank

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

    boxes (K, 4) xyxy; K is padded internally to a multiple of 1024
    (8 sublanes x 128 lanes) so state tiles are fully dense.
    """
    k0 = boxes.shape[0]
    k = max(((k0 + 1023) // 1024) * 1024, 1024)
    rows, cols = 8, k // 8
    steps = k0 if max_out is None else min(max_out, k0)
    if per_class is None:
        per_class = class_ids is not None
    if valid is None:
        valid = jnp.ones((k0,), bool)
    if class_ids is None:
        class_ids = jnp.zeros((k0,), jnp.int32)

    pad = k - k0
    boxes_t = jnp.pad(boxes.astype(jnp.float32), ((0, pad), (0, 0)))
    boxes_t = boxes_t.T.reshape(4, rows, cols)
    scores_p = jnp.pad(scores.astype(jnp.float32), (0, pad)).reshape(rows, cols)
    valid_p = jnp.pad(valid.astype(jnp.float32), (0, pad)).reshape(rows, cols)
    cls_p = jnp.pad(class_ids.astype(jnp.float32), (0, pad)).reshape(rows, cols)

    kernel = _make_kernel(rows, cols, steps, _METHODS[method], sigma,
                          iou_threshold, score_threshold, per_class)
    out_scores, selected, rank = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            jax.ShapeDtypeStruct((rows, cols), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(boxes_t, scores_p, valid_p, cls_p)

    out_scores = out_scores.reshape(k)[:k0]
    selected = selected.reshape(k)[:k0]
    rank = rank.reshape(k)[:k0]
    return (out_scores, selected > 0.5,
            jnp.where(rank >= steps, k0, rank))


def soft_nms_auto(*args, **kw):
    """Use the Pallas kernel on TPU, the XLA formulation elsewhere."""
    import jax as _jax
    from rrnet_tpu.ops import nms as _nms
    if _jax.default_backend() in ("tpu", "axon"):
        return soft_nms_pallas(*args, **kw)
    return _nms.soft_nms(*args, **kw)
