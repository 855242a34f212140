"""Fixed-shape device NMS / soft-NMS.

TPU-native replacements for the reference's native extensions:
  * `ext/nms/nms/cpu_nms.pyx:122-173` / `ext/nms/nms/nms_kernel.cu`
    (greedy hard NMS) -> `hard_nms`,
  * `ext/nms/nms/cpu_nms.pyx:17-120` (Bodla soft-NMS: linear / gaussian /
    hard score decay) -> `soft_nms`.

Instead of returning a dynamically-sized keep list, every function takes a
fixed-K box set with a validity mask and returns fixed-K masks/scores, so
the whole detection pipeline stays jittable on device. Batch via jax.vmap.

Per-class behaviour is expressed with a `class_ids` argument: suppression /
decay only acts between boxes of the same class, which is mathematically
identical to looping classes separately (decays across classes commute)
but runs as one fused kernel.

A Pallas single-program VMEM kernel for SOFT-NMS (the sequential
select/decay loop, which XLA cannot batch) lives in
`rrnet_tpu.ops.pallas_nms`. Hard NMS needs no Pallas kernel: the
fixpoint formulation below runs the whole suppression as a handful of
(K, K) MXU matvecs, which is already the TPU-fast shape (the reference's
nms_kernel.cu bitmask tiling exists to work around CUDA's lack of a
fast dense masked matvec at this size).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from rrnet_tpu.ops.box import pairwise_iou


def _suppression_matrix(boxes, class_ids, plus_one):
    iou = pairwise_iou(boxes, boxes, plus_one=plus_one)
    if class_ids is not None:
        same = class_ids[:, None] == class_ids[None, :]
        iou = jnp.where(same, iou, 0.0)
    return iou


def hard_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: Optional[jnp.ndarray] = None,
    class_ids: Optional[jnp.ndarray] = None,
    plus_one: bool = False,
    suppress_equal: bool = False,
    method: str = "fixpoint",
) -> jnp.ndarray:
    """Greedy hard NMS over a fixed-K box set -> (K,) bool keep mask.

    Semantics match `torchvision.ops.nms` (suppress on iou > thr) as used
    by RRNet stage 1 (models/rrnet.py:69); with `plus_one=True,
    suppress_equal=True` it matches the reference Cython `cpu_nms`
    (ext/nms/nms/cpu_nms.pyx:122-173, suppress on iou >= thr with +1
    areas).

    method='fixpoint' (default, TPU-fast): iterate
        keep <- valid & ~any_higher_scored_kept_overlap(keep)
    to convergence (lax.while_loop). The greedy keep set is the unique
    fixpoint reached after at most `suppression chain depth` iterations
    (typically < 20); each iteration is a single (K,K) masked matvec the
    MXU executes, instead of K sequential scalar steps.
    method='sequential': the literal greedy scan (O(K) serial steps) —
    kept as the semantics oracle.

    boxes: (K, 4) xyxy. scores: (K,). valid: (K,) bool or None.
    """
    k = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((k,), dtype=bool)

    # Sort by score descending; invalid boxes sink to the end.
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    boxes_s = boxes[order]
    valid_s = valid[order]
    cls_s = class_ids[order] if class_ids is not None else None

    iou = _suppression_matrix(boxes_s, cls_s, plus_one)
    overlap = (iou >= iou_threshold) if suppress_equal else (iou > iou_threshold)
    idx = jnp.arange(k)

    if method == "fixpoint":
        # can[i, j]: a kept i would suppress j (strictly lower-scored)
        can = (overlap & (idx[:, None] < idx[None, :]) &
               valid_s[:, None]).astype(jnp.float32)

        def cond(state):
            keep, prev, it = state
            return jnp.any(keep != prev) & (it < k)

        def body(state):
            keep, _, it = state
            supp = (keep.astype(jnp.float32) @ can) > 0.0
            return valid_s & ~supp, keep, it + 1

        keep_s, _, _ = jax.lax.while_loop(
            cond, body, (valid_s, jnp.zeros((k,), bool), jnp.zeros((), jnp.int32)))
    else:
        def body(i, state):
            keep, suppressed = state
            is_kept = valid_s[i] & ~suppressed[i]
            keep = keep.at[i].set(is_kept)
            row = overlap[i]
            suppressed = suppressed | (is_kept & row & (idx > i))
            return keep, suppressed

        keep_s, _ = jax.lax.fori_loop(
            0, k, body, (jnp.zeros((k,), bool), jnp.zeros((k,), bool))
        )
    # Scatter back to the original order.
    return jnp.zeros((k,), bool).at[order].set(keep_s)


_METHODS = {"linear": 1, "gaussian": 2, "hard": 0}


@partial(jax.jit, static_argnames=("method", "max_out"))
def soft_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    class_ids: Optional[jnp.ndarray] = None,
    sigma: float = 0.5,
    iou_threshold: float = 0.3,
    score_threshold: float = 0.001,
    method: str = "gaussian",
    max_out: Optional[int] = None,
):
    """Soft-NMS (Bodla et al.) over a fixed-K box set.

    Bit-matches the reference Cython `cpu_soft_nms`
    (ext/nms/nms/cpu_nms.pyx:17-120): iterated max-score selection; after
    each selection every remaining box's score is decayed by an IoU-based
    weight (IoU with legacy +1 areas); a box whose decayed score drops
    below `score_threshold` is discarded and can never be selected.

    Returns (new_scores, keep, rank):
      new_scores: (K,) decayed scores,
      keep:       (K,) bool — selected (i.e. surviving) boxes,
      rank:       (K,) int32 — selection order (0 = first selected,
                  K for unselected); sorting kept boxes by `rank`
                  reproduces the reference's output order.

    `max_out` bounds the number of selection iterations (exact when
    max_out >= number of survivors; defaults to K).
    """
    k = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((k,), dtype=bool)
    steps = k if max_out is None else min(max_out, k)
    method_id = _METHODS[method]

    iou = _suppression_matrix(boxes, class_ids, plus_one=True)
    scores = jnp.where(valid, scores, -jnp.inf)

    def body(step, state):
        cur, active, selected, rank = state
        cand = jnp.where(active & ~selected, cur, -jnp.inf)
        m = jnp.argmax(cand)
        any_left = cand[m] > -jnp.inf

        selected = selected.at[m].set(selected[m] | any_left)
        rank = rank.at[m].set(jnp.where(any_left & (rank[m] == k), step, rank[m]))

        ov = iou[m]
        if method_id == 1:       # linear
            w = jnp.where(ov > iou_threshold, 1.0 - ov, 1.0)
        elif method_id == 2:     # gaussian
            w = jnp.exp(-(ov * ov) / sigma)
        else:                    # hard
            w = jnp.where(ov > iou_threshold, 0.0, 1.0)

        decay = active & ~selected & any_left
        cur = jnp.where(decay, cur * w, cur)
        # A box is only discarded when it actually overlaps the selected
        # box (the reference checks the threshold inside the iw>0/ih>0
        # branch, cpu_nms.pyx:85-115): non-overlapping low-score boxes
        # survive and are eventually selected.
        dropped = decay & (ov > 0.0) & (cur < score_threshold)
        active = active & ~dropped
        return cur, active, selected, rank

    init = (
        scores,
        valid,
        jnp.zeros((k,), bool),
        jnp.full((k,), k, dtype=jnp.int32),
    )
    cur, active, selected, rank = jax.lax.fori_loop(0, steps, body, init)
    return cur, selected, rank


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    class_ids: jnp.ndarray,
    iou_threshold: float,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-class hard NMS via the class-offset trick: boxes of different
    classes are translated to disjoint regions so a single class-agnostic
    pass can never suppress across classes. Cheaper than the masked-IoU
    path when class count is large. Returns (K,) keep mask."""
    if valid is None:
        valid = jnp.ones(boxes.shape[0], dtype=bool)
    # span must exceed the full coordinate EXTENT (boxes may have
    # negative coords after decode), or adjacent class blocks could touch
    span = 2.0 * jnp.max(jnp.where(valid[:, None], jnp.abs(boxes), 0.0)) + 1.0
    offset = class_ids.astype(boxes.dtype)[:, None] * span
    shifted = boxes + offset
    return hard_nms(shifted, scores, iou_threshold, valid=valid)


def topk_after_nms(boxes, scores, keep, k):
    """Select the k highest-scoring kept boxes into a dense (k, ...) block.

    Returns (boxes_k, scores_k, valid_k, idx_k). Used to hand a static ROI
    budget to RRNet stage 2 (replaces models/rrnet.py:37-51's dynamic
    concat)."""
    masked = jnp.where(keep, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(masked, k)
    return boxes[idx], top_scores, top_scores > -jnp.inf, idx
