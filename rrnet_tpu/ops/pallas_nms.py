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
  * chunked early exit: `max_out` bounds the iteration count; a true
    while_loop is unavailable (Mosaic on this backend hangs compiling
    scf.while — minimal repro: any lax.while_loop inside pallas_call),
    so the loop runs in fixed-trip chunks of 64 with state in VMEM
    scratch and each chunk guarded by pl.when on an SMEM "no
    candidates left" flag. Dead chunks cost one predicate test. The
    nested-chunk structure also cut the fresh Mosaic compile from
    ~99 s (r4's single 512-trip fori) to <1 s.

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
                 per_class: bool, chunk: int = 64):
    n_chunks = (steps + chunk - 1) // chunk

    def kernel(boxes_ref, scores_ref, valid_ref, cls_ref,
               out_scores_ref, selected_ref, rank_ref,
               cur_s, act_s, sel_s, rank_s, done_s):
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
        cur_s[...] = jnp.where(valid, scores_ref[...], _NEG)
        act_s[...] = valid.astype(jnp.float32)
        sel_s[...] = jnp.zeros((rows, cols), jnp.float32)
        rank_s[...] = jnp.full((rows, cols), k, jnp.int32)
        done_s[0] = 0

        def body(step, state):
            # flags carried as f32 tiles (Mosaic-friendly)
            cur, active_f, selected_f, rank = state
            active = active_f > 0.0
            selected = selected_f > 0.0
            cand = jnp.where(active & jnp.logical_not(selected), cur, _NEG)
            maxval = jnp.max(cand)
            # the step < steps guard makes the padded tail of the last
            # chunk a no-op (chunks have STATIC trip counts — a dynamic
            # fori bound would lower to scf.while, which wedges Mosaic
            # on this backend)
            any_left = (maxval > _NEG) & (step < steps)
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

        # Chunked early exit: Mosaic hangs on scf.while (module
        # docstring), so run fixed-trip chunks with the body guarded by
        # pl.when on an SMEM "done" flag — once candidates run out the
        # remaining chunks cost one predicate test each. Bonus: the
        # nested loop also compiles ~50x faster than a single deep fori
        # (the r4 RRNet soft-NMS warmup was 98.8 s; see NMS_BENCH).
        def chunk_body(ci, carry):
            @pl.when(done_s[0] == 0)
            def _run_chunk():
                def gbody(s, st):
                    return body(ci * chunk + s, st)

                st = (cur_s[...], act_s[...], sel_s[...], rank_s[...])
                cur, act_f, sel_f, rank = jax.lax.fori_loop(
                    0, chunk, gbody, st)
                cur_s[...] = cur
                act_s[...] = act_f
                sel_s[...] = sel_f
                rank_s[...] = rank
                remaining = jnp.max(jnp.where(
                    (act_f > 0.0) & jnp.logical_not(sel_f > 0.0),
                    cur, _NEG))
                done_s[0] = jnp.where(remaining > -1e29, 0, 1
                                      ).astype(jnp.int32)
            return carry

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        out_scores_ref[...] = cur_s[...]
        selected_ref[...] = sel_s[...]
        rank_ref[...] = rank_s[...]

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
        scratch_shapes=[pltpu.VMEM((rows, cols), jnp.float32)] * 3 +
                       [pltpu.VMEM((rows, cols), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(boxes_t, scores_p, valid_p, cls_p)

    out_scores = out_scores.reshape(k)[:k0]
    selected = selected.reshape(k)[:k0]
    rank = rank.reshape(k)[:k0]
    return (out_scores, selected > 0.5,
            jnp.where(rank >= steps, k0, rank))


# ---------------------------------------------------------------------------
# class-parallel kernel (per_class=True)
# ---------------------------------------------------------------------------
#
# Per-class decays commute (a selection only ever decays same-class
# boxes), so per_class soft-NMS is C independent sequential problems.
# This kernel lays the candidates out as one SUBLANE ROW PER CLASS
# (C_pad, Kc) and advances ALL classes one selection per iteration with
# row-wise reductions only — max/argmax/coordinate extraction all stay
# (C_pad, 1) vectors, so the loop body never round-trips through the
# scalar unit (the per-iteration latency sink of the global kernel
# above, which extracts 7 scalars per selection). Iteration count drops
# from total-selections to max-per-class-selections.
#
# Early exit: Mosaic hangs on scf.while (module docstring), so the loop
# runs in fixed-trip chunks with the whole chunk body guarded by
# pl.when on an SMEM "done" flag — dead chunks cost one predicate test.
#
# Exactness vs the Cython loop (ext/nms/nms/cpu_nms.pyx:36-117): the
# selected set and selected scores are identical (decays commute); the
# GLOBAL selection order is the descending merge of the per-class
# selection sequences — within a class selection scores are
# non-increasing and classes do not interact — so rank is reconstructed
# outside as the position in (-final_score, index) order among selected
# boxes, and max_out truncation keeps the first max_out of that order
# (the same prefix the Cython loop would have stopped at).


def _make_rows_kernel(c_pad: int, kc: int, n_chunks: int, chunk: int,
                      method_id: int, sigma: float, iou_threshold: float,
                      score_threshold: float):
    def kernel(x1_ref, y1_ref, x2_ref, y2_ref, sc_ref, vl_ref,
               out_scores_ref, selected_ref,
               cur_s, act_s, sel_s, done_s):
        x1 = x1_ref[...]
        y1 = y1_ref[...]
        x2 = x2_ref[...]
        y2 = y2_ref[...]
        area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
        idx = jax.lax.broadcasted_iota(jnp.int32, (c_pad, kc), 1)

        valid = vl_ref[...] > 0.0
        cur_s[...] = jnp.where(valid, sc_ref[...], _NEG)
        act_s[...] = vl_ref[...]
        sel_s[...] = jnp.zeros((c_pad, kc), jnp.float32)
        done_s[0] = 0

        def body(step, state):
            cur, act_f, sel_f = state
            active = act_f > 0.0
            seld = sel_f > 0.0
            cand = jnp.where(active & jnp.logical_not(seld), cur, _NEG)
            rmax = jnp.max(cand, axis=1, keepdims=True)          # (C, 1)
            any_row = rmax > -1e29
            is_max = cand >= rmax
            first = jnp.min(jnp.where(is_max, idx, kc),
                            axis=1, keepdims=True)               # (C, 1)
            is_m = (idx == first) & any_row
            seld = seld | is_m

            bx1 = jnp.sum(jnp.where(is_m, x1, 0.0), axis=1, keepdims=True)
            by1 = jnp.sum(jnp.where(is_m, y1, 0.0), axis=1, keepdims=True)
            bx2 = jnp.sum(jnp.where(is_m, x2, 0.0), axis=1, keepdims=True)
            by2 = jnp.sum(jnp.where(is_m, y2, 0.0), axis=1, keepdims=True)
            barea = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
            iw = jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1) + 1.0
            ih = jnp.minimum(by2, y2) - jnp.maximum(by1, y1) + 1.0
            overlap_pos = (iw > 0.0) & (ih > 0.0) & any_row
            inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
            ov = inter / jnp.maximum(barea + area - inter, 1e-12)
            ov = jnp.where(overlap_pos, ov, 0.0)

            if method_id == 1:       # linear
                wgt = jnp.where(ov > iou_threshold, 1.0 - ov, 1.0)
            elif method_id == 2:     # gaussian
                wgt = jnp.exp(-(ov * ov) / sigma)
            else:                    # hard
                wgt = jnp.where(ov > iou_threshold, 0.0, 1.0)

            decay = active & jnp.logical_not(seld) & any_row
            cur = jnp.where(decay, cur * wgt, cur)
            dropped = decay & overlap_pos & (cur < score_threshold)
            active = active & jnp.logical_not(dropped)
            return (cur, active.astype(jnp.float32),
                    seld.astype(jnp.float32))

        def chunk_body(ci, carry):
            @pl.when(done_s[0] == 0)
            def _run_chunk():
                st = (cur_s[...], act_s[...], sel_s[...])
                cur, act_f, sel_f = jax.lax.fori_loop(0, chunk, body, st)
                cur_s[...] = cur
                act_s[...] = act_f
                sel_s[...] = sel_f
                remaining = jnp.max(jnp.where(
                    (act_f > 0.0) & jnp.logical_not(sel_f > 0.0),
                    cur, _NEG))
                done_s[0] = jnp.where(remaining > -1e29, 0, 1
                                      ).astype(jnp.int32)
            return carry

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        out_scores_ref[...] = cur_s[...]
        selected_ref[...] = sel_s[...]

    return kernel


@partial(jax.jit, static_argnames=("num_classes", "method", "max_out",
                                   "sigma", "iou_threshold",
                                   "score_threshold", "interpret"))
def soft_nms_pallas_classes(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    class_ids: Optional[jnp.ndarray] = None,
    num_classes: int = 10,
    sigma: float = 0.5,
    iou_threshold: float = 0.3,
    score_threshold: float = 0.001,
    method: str = "gaussian",
    max_out: Optional[int] = None,
    interpret: bool = False,
):
    """Class-parallel per_class soft-NMS. Same (new_scores, keep, rank)
    contract as soft_nms_pallas(per_class=True); `num_classes` must be a
    static bound on class_ids. new_scores of NON-kept boxes may carry
    more decays than the sequential oracle applies before its max_out
    cutoff — kept boxes' scores, the keep set and kept ranks are exact.
    """
    k0 = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((k0,), bool)
    if class_ids is None:
        class_ids = jnp.zeros((k0,), jnp.int32)
    c_pad = ((num_classes + 1 + 7) // 8) * 8     # +1 overflow row (invalid)
    kc = max(((k0 + 127) // 128) * 128, 128)

    # --- partition to class rows (invalid -> overflow row) -----------
    cls = jnp.where(valid, class_ids.astype(jnp.int32), num_classes)
    order = jnp.argsort(cls, stable=True)
    cls_s = jnp.take(cls, order)
    iota = jnp.arange(k0, dtype=jnp.int32)
    newseg = jnp.concatenate([jnp.ones((1,), bool),
                              cls_s[1:] != cls_s[:-1]])
    seg_begin = jax.lax.cummax(jnp.where(newseg, iota, 0))
    pos = iota - seg_begin
    dest = cls_s * kc + pos                      # strictly increasing
    slots = jnp.arange(c_pad * kc, dtype=jnp.int32)
    j = jnp.searchsorted(dest, slots)
    j_c = jnp.clip(j, 0, k0 - 1)
    found = (j < k0) & (jnp.take(dest, j_c) == slots)
    src = jnp.take(order, j_c)                   # original index per slot

    def part(v, fill):
        vv = jnp.take(v.astype(jnp.float32), src)
        return jnp.where(found, vv, fill).reshape(c_pad, kc)

    x1 = part(boxes[:, 0], 0.0)
    y1 = part(boxes[:, 1], 0.0)
    x2 = part(boxes[:, 2], 0.0)
    y2 = part(boxes[:, 3], 0.0)
    sc = part(scores, _NEG)
    vl = part(valid.astype(jnp.float32), 0.0)

    chunk = 64
    n_chunks = (min(k0, kc) + chunk - 1) // chunk
    kernel = _make_rows_kernel(c_pad, kc, n_chunks, chunk,
                               _METHODS[method], sigma, iou_threshold,
                               score_threshold)
    out_scores, selected = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((c_pad, kc), jnp.float32),
            jax.ShapeDtypeStruct((c_pad, kc), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        scratch_shapes=[pltpu.VMEM((c_pad, kc), jnp.float32)] * 3 +
                       [pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(x1, y1, x2, y2, sc, vl)

    # --- map back + oracle-exact global order ------------------------
    cur_sorted = jnp.take(out_scores.reshape(-1), dest)
    sel_sorted = jnp.take(selected.reshape(-1), dest)
    inv = jnp.argsort(order)
    new_scores = jnp.take(cur_sorted, inv)
    sel = jnp.take(sel_sorted, inv) > 0.5

    steps = k0 if max_out is None else min(max_out, k0)
    sort_key = jnp.where(sel, -new_scores, jnp.inf)
    ord2 = jnp.argsort(sort_key, stable=True)    # ties by index (Cython)
    rank_global = jnp.argsort(ord2)              # inverse permutation
    keep = sel & (rank_global < steps)
    rank = jnp.where(keep, rank_global, k0)
    # new_scores stays the back-mapped kernel state: decayed values for
    # non-selected valid boxes and _NEG for invalid ones — the same
    # convention soft_nms_pallas returns (with no max_out both kernels
    # run every class to exhaustion, so non-kept decays match exactly;
    # under max_out this kernel may apply more decays, per docstring).
    return new_scores, keep, rank


def soft_nms_auto(boxes, scores, valid=None, class_ids=None,
                  num_classes=None, class_parallel=False, **kw):
    """Backend dispatch: the chunked serial Pallas kernel on TPU, the
    XLA formulation elsewhere.

    `class_parallel=True` opts into soft_nms_pallas_classes (requires
    per-class + static num_classes). Measured at the flagship shape
    (K=1500, 10 classes, vmap batch 8) the serial kernel wins 0.63 vs
    4.25 ms/img — the class-rows layout must size every row for the
    worst-case class count (Kc=K for exactness), so its per-iteration
    tile is ~16x larger and the kernel is throughput-bound, which
    swamps its ~8x iteration-count advantage. It would win only when a
    tight static per-class capacity exists. Numbers: NMS_BENCH.json."""
    import jax as _jax
    from rrnet_tpu.ops import nms as _nms
    if _jax.default_backend() in ("tpu", "axon"):
        per_class = kw.pop("per_class", None)
        if per_class is None:
            per_class = class_ids is not None
        if (class_parallel and per_class and class_ids is not None
                and num_classes is not None):
            return soft_nms_pallas_classes(
                boxes, scores, valid, class_ids,
                num_classes=num_classes, **kw)
        return soft_nms_pallas(boxes, scores, valid, class_ids,
                               per_class=per_class, **kw)
    kw.pop("per_class", None)
    return _nms.soft_nms(*(boxes, scores, valid, class_ids), **kw)
