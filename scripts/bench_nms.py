"""Soft-NMS / hard-NMS microbenchmark: XLA vs Pallas vs host C++.

The reference's eval wall-clock bottleneck was its CPU Cython soft-NMS
(ext/nms/nms/cpu_nms.pyx:17-120: quadratic, per class, per scale). We
carry three implementations (ops.nms.soft_nms XLA fori_loop,
ops.pallas_nms.soft_nms_pallas single-program VMEM kernel,
evallib.host_nms C++ via ctypes) — this script measures them at the
flagship shape (K=1500 stage-1 candidates, 10 classes, per-class decay,
the RRNet stage-1 setting in models/rrnet.py) and records the numbers
into NMS_BENCH.json so the Pallas kernel's speedup claim is a committed
artifact (r2 verdict: the "2.4x the XLA loop" claim had no benchmark).

Timing protocol: per-dispatch RPC on this rig is ~5 ms and
block_until_ready can return early (PERF.md), so device measurements run
`steps` chained dispatches and force a scalar fetch at the end.

Usage: python scripts/bench_nms.py [--k 1500] [--steps 10]
           [--out NMS_BENCH.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dets(k: int, num_classes: int = 10, seed: int = 0):
    """Stage-1-like candidates: top-k decoded boxes in a 768x1408 image,
    clustered (so NMS actually suppresses), exponentially-decaying
    scores, 10 VisDrone classes."""
    rng = np.random.RandomState(seed)
    n_clusters = max(k // 12, 1)
    centers = rng.rand(n_clusters, 2) * [1408, 768]
    idx = rng.randint(0, n_clusters, k)
    cxy = centers[idx] + rng.randn(k, 2) * 12.0
    wh = np.exp(rng.randn(k, 2) * 0.4 + np.log(28.0))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], 1).astype(np.float32)
    scores = np.sort(rng.rand(k).astype(np.float32))[::-1] ** 2
    classes = rng.randint(0, num_classes, k).astype(np.int32)
    return boxes, scores, classes


def time_device(fn, args, steps: int) -> float:
    import jax
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    runs = []
    for _ in range(3):
        t0 = time.time()
        acc = None
        for _ in range(steps):
            acc = fn(*args)
        leaf = jax.tree_util.tree_leaves(acc)[0]
        np.asarray(leaf).reshape(-1)[0]
        runs.append((time.time() - t0) / steps)
    return sorted(runs)[1]


def time_host(fn, steps: int) -> float:
    fn()
    runs = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(steps):
            fn()
        runs.append((time.time() - t0) / steps)
    return sorted(runs)[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=1500)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "NMS_BENCH.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rrnet_tpu.evallib import host_nms
    from rrnet_tpu.ops.nms import hard_nms, soft_nms
    from rrnet_tpu.ops.pallas_nms import (soft_nms_pallas,
                                          soft_nms_pallas_classes)

    k = args.k
    boxes_np, scores_np, classes_np = make_dets(k)
    boxes = jnp.asarray(boxes_np)
    scores = jnp.asarray(scores_np)
    classes = jnp.asarray(classes_np)

    # RRNet stage-1 setting: gaussian soft-NMS, sigma .5, Nt .7, thr .1,
    # per-class (models/rrnet.py:56-80 / configs/rrnet_config.py:82-83).
    kw = dict(sigma=0.5, iou_threshold=0.7, score_threshold=0.1,
              method="gaussian")

    xla = jax.jit(lambda b, s, c: soft_nms(b, s, class_ids=c, **kw))
    pallas = jax.jit(
        lambda b, s, c: soft_nms_pallas(b, s, class_ids=c, **kw))
    pallas_cp = jax.jit(
        lambda b, s, c: soft_nms_pallas_classes(b, s, class_ids=c,
                                                num_classes=10, **kw))

    # correctness cross-check before timing. Keep sets must agree; ranks
    # may swap only at near-ties (the VPU exp() in the kernel rounds
    # differently from XLA's, so two near-equal decayed scores can
    # change order — semantics-preserving).
    sc_x, keep_x, rank_x = [np.asarray(v) for v in xla(boxes, scores, classes)]
    sc_p, keep_p, rank_p = [np.asarray(v) for v in
                            pallas(boxes, scores, classes)]
    assert (keep_x == keep_p).all(), "pallas/XLA keep mismatch"
    swapped = rank_x != rank_p
    if swapped.any():
        np.testing.assert_allclose(sc_x[swapped], sc_p[swapped],
                                   rtol=5e-3, atol=1e-4,
                                   err_msg="rank mismatch beyond near-tie")
        print(f"# {int(swapped.sum())} near-tie rank swaps", file=sys.stderr)
    np.testing.assert_allclose(sc_x[keep_x], sc_p[keep_p], rtol=1e-3,
                               atol=1e-5)
    t0 = time.time()
    sc_c, keep_c, rank_c = [np.asarray(v) for v in
                            pallas_cp(boxes, scores, classes)]
    cp_compile_s = time.time() - t0
    assert (keep_x == keep_c).all(), "class-parallel/XLA keep mismatch"
    np.testing.assert_allclose(sc_x[keep_x], sc_c[keep_c], rtol=1e-3,
                               atol=1e-5)

    def host_call():
        # the reference protocol: one Cython call per class
        for c in range(10):
            m = classes_np == c
            dets = np.concatenate(
                [boxes_np[m], scores_np[m, None]], 1).astype(np.float32)
            host_nms.soft_nms(dets, Nt=0.7, threshold=0.1,
                              method=2, sigma=0.5)

    t_xla = time_device(xla, (boxes, scores, classes), args.steps)
    t_pallas = time_device(pallas, (boxes, scores, classes), args.steps)
    t_cp = time_device(pallas_cp, (boxes, scores, classes), args.steps)
    t_host = time_host(host_call, max(args.steps, 20))

    # production basis: single-dispatch timings above sit on the ~3 ms
    # RPC pipeline floor of this rig; inside the model the kernel runs
    # vmapped over the batch in one big jitted program, so the
    # per-image vmap cost is the number that matters
    B = 8
    bb = jnp.asarray(np.stack([boxes_np] * B))
    sb = jnp.asarray(np.stack([scores_np] * B))
    cb = jnp.asarray(np.stack([classes_np] * B))
    serial_v = jax.jit(lambda b, s, c: jax.vmap(
        lambda b1, s1, c1: soft_nms_pallas(
            b1, s1, class_ids=c1, max_out=512, **kw))(b, s, c))
    cp_v = jax.jit(lambda b, s, c: jax.vmap(
        lambda b1, s1, c1: soft_nms_pallas_classes(
            b1, s1, class_ids=c1, num_classes=10, max_out=512,
            **kw))(b, s, c))
    t_serial_v = time_device(serial_v, (bb, sb, cb), args.steps)
    t_cp_v = time_device(cp_v, (bb, sb, cb), args.steps)

    hard = jax.jit(lambda b, s, c: hard_nms(b, s, 0.7, class_ids=c))
    t_hard = time_device(hard, (boxes, scores, classes), args.steps)

    result = {
        "device": jax.devices()[0].device_kind,
        "k": k,
        "num_classes": 10,
        "protocol": "gaussian soft-NMS sigma=.5 Nt=.7 thr=.1 per-class "
                    "(RRNet stage-1); median of 3 runs of chained steps",
        "soft_nms_ms": {
            "xla_fori_loop": round(t_xla * 1e3, 3),
            "pallas_vmem_kernel": round(t_pallas * 1e3, 3),
            "pallas_class_parallel": round(t_cp * 1e3, 3),
            "host_cpp_ctypes": round(t_host * 1e3, 3),
        },
        "soft_nms_vmap8_ms_per_img": {
            "serial_chunked": round(t_serial_v / B * 1e3, 3),
            "class_parallel": round(t_cp_v / B * 1e3, 3),
        },
        "pallas_speedup_vs_xla": round(t_xla / t_pallas, 2),
        "pallas_speedup_vs_host": round(t_host / t_pallas, 2),
        "serial_vmap_vs_host_per_img": round(t_host / (t_serial_v / B), 2),
        "class_parallel_speedup_vs_serial": round(t_pallas / t_cp, 2),
        "class_parallel_compile_s": round(cp_compile_s, 1),
        "hard_nms_fixpoint_ms": round(t_hard * 1e3, 3),
        "kept_boxes": int(keep_x.sum()),
        "note": "host C++ wall-clock excludes the device->host->device "
                "round trip (2x ~5ms RPC + transfer + pipeline stall) "
                "that using it inside RRNet's device loop would cost; "
                "the Pallas kernel keeps stage-1 NMS -> stage-2 ROI "
                "align entirely on device. Single-dispatch device "
                "timings sit on this rig's ~3 ms RPC pipeline floor — "
                "the vmap8 per-image numbers are the in-model cost "
                "(serial_chunked beats the single-core host C++ there). "
                "class_parallel loses at this shape: exact per-class "
                "capacity must be K, making its per-iteration tile "
                "~16x larger (throughput-bound) — kept for workloads "
                "with a tight static class capacity.",
    }
    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
