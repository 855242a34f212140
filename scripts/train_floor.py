"""Train-step roofline artifact -> TRAIN_FLOOR.json.

The r2/r3 verdicts asked for the batch-8 512^2 CenterNet train step at
<= 80 ms, "or a committed trace showing the remaining gap is irreducible
input/epilogue". PERF.md carries that analysis in prose; this script
makes it a machine-checkable artifact:

  * XLA cost analysis of the EXACT compiled step -> FLOPs + bytes ->
    compute floor (bf16 peak) and memory floor (HBM bandwidth); the
    step is memory-bound when memory_floor > compute_floor.
  * xplane device trace of the same step -> measured device ms/step and
    a category breakdown (conv/fusion vs copies vs small-op tail).
  * pct_of_memory_roofline = memory_floor / measured — how close the
    step runs to the hardware bound. 80 ms at batch 8 corresponds to
    91.5% of the 73.2 ms roofline with zero budget for the loss,
    target renderer and scheduler tail; r3 measured ~79%.

Usage: python scripts/train_floor.py [--batch 8] [--steps 5]
       [--out TRAIN_FLOOR.json]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="centernet")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(REPO, "TRAIN_FLOOR.json"))
    args = ap.parse_args()

    import jax

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.train import Trainer
    from rrnet_tpu.utils.cache import enable_compilation_cache
    from scripts.profile_train import categorize, parse_xplane
    from scripts.tpu_gate import synthetic_batch

    enable_compilation_cache()
    cfg = cfglib.PRESETS[args.family]()
    cfg = cfglib.apply_overrides(cfg, [
        f"train.batch_size={args.batch}",
        f"train.crop_size=({args.size},{args.size})",
    ])
    trainer = Trainer(cfg)
    state = trainer.init_state()
    rng = np.random.RandomState(0)
    batches = [trainer.shard(synthetic_batch(rng, args.batch, args.size, 64))
               for _ in range(3)]

    # compile + settle
    for i in range(3):
        state, metrics = trainer.train_step(state, batches[i % 3])
    float(metrics["total"])

    # --- cost analysis of the exact compiled step --------------------
    # trainer.train_step is the jitted callable itself
    lowered = trainer.train_step.lower(state, batches[0]).compile()
    ca = lowered.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    tflop = float(ca.get("flops", 0.0)) / 1e12
    gbytes = float(ca.get("bytes accessed", 0.0)) / 1e9
    compute_floor_ms = tflop / V5E_BF16_TFLOPS * 1e3
    memory_floor_ms = gbytes / V5E_HBM_GBS * 1e3
    floor_ms = max(compute_floor_ms, memory_floor_ms)

    # --- wall-clock ms/step (dispatch-pipelined, like tpu_gate) ------
    t0 = time.time()
    n_wall = 20
    for i in range(n_wall):
        state, metrics = trainer.train_step(state, batches[i % 3])
    float(metrics["total"])
    wall_ms = (time.time() - t0) / n_wall * 1e3

    # --- device trace ------------------------------------------------
    trace_dir = tempfile.mkdtemp(prefix="trainfloor_")
    with jax.profiler.trace(trace_dir):
        for i in range(args.steps):
            state, metrics = trainer.train_step(state, batches[i % 3])
        float(metrics["total"])
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb*"),
                      recursive=True)
    agg = collections.defaultdict(lambda: [0, 0])
    for f in files:
        for name, ns, cnt in parse_xplane(f):
            agg[name][0] += ns
            agg[name][1] += cnt
    total_ns = sum(v[0] for v in agg.values())
    device_ms = total_ns / 1e6 / args.steps
    cats = collections.Counter()
    for name, (ns, _) in agg.items():
        cats[categorize(name)] += ns
    breakdown = {c: round(ns / 1e6 / args.steps, 2)
                 for c, ns in cats.most_common()}
    n_ops = sum(cnt for _, (_, cnt) in agg.items()) // args.steps

    # --- component bounds (r4 verdict item 5): bound each non-conv ----
    # component by measuring it STANDALONE (pessimistic: in-step these
    # fuse into and overlap with the conv pipeline, so the sum of these
    # bounds >= their true in-step cost). What remains of the
    # (measured - conv_floor) gap after subtracting the bounds is conv
    # pipeline scheduling (VMEM prefetch copy-dones) — not an op any
    # restructuring can remove at the XLA level.
    import jax.numpy as jnp
    from rrnet_tpu.train import criterions

    b0 = batches[0]

    def wall(fn, *fargs, n=30):
        out = fn(*fargs)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        t0 = time.time()
        for _ in range(n):
            out = fn(*fargs)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)
        return (time.time() - t0) / n * 1e3

    s = cfg.train.scale_factor
    feat = (args.size // s, args.size // s)
    renderer = jax.jit(lambda a, v: criterions.centernet_targets(
        a, v, feat, s, cfg.num_classes))
    t_render = wall(renderer, b0["annos"], b0["valid"])

    grads_ms = wall(lambda st, bb: trainer.loss_and_grads(st, bb),
                    state, b0, n=10)

    # optimizer-only: fused Adam over the full tree with fixed grads
    _, g0 = trainer.loss_and_grads(state, b0)
    opt_step = jax.jit(
        lambda st, g: st.apply_gradients(g, good=jnp.float32(1.0)))
    t_opt = wall(opt_step, state, g0, n=10)

    component_bounds = {
        "target_renderer_standalone_ms": round(t_render, 2),
        "loss_and_grads_ms": round(grads_ms, 1),
        "fused_adam_standalone_ms": round(t_opt, 2),
        "full_step_minus_grads_ms": round(wall_ms - grads_ms, 1),
    }

    result = {
        "protocol": f"{args.family} batch {args.batch} @ {args.size}^2, "
                    "one donated jitted SPMD train step (fwd + bwd + "
                    "fused Adam + on-device target render)",
        "device": jax.devices()[0].device_kind,
        "xla_cost_analysis": {
            "tflop_per_step": round(tflop, 2),
            "gbytes_accessed_per_step": round(gbytes, 1),
            "compute_floor_ms": round(compute_floor_ms, 1),
            "memory_floor_ms": round(memory_floor_ms, 1),
            "bound": ("memory" if memory_floor_ms > compute_floor_ms
                      else "compute"),
        },
        "measured_device_ms_per_step": round(device_ms, 1),
        "measured_wall_ms_per_step": round(wall_ms, 1),
        "pct_of_roofline": round(100.0 * floor_ms / device_ms, 1),
        "device_time_breakdown_ms": breakdown,
        "component_bounds_ms": component_bounds,
        "ops_per_step": int(n_ops),
        "note": ("the step is bound by the larger floor; the gap to it "
                 "decomposes (component_bounds_ms): optimizer marginal "
                 "= wall - loss_and_grads (bandwidth floor on the "
                 "f32 param+moment traffic), renderer/loss bounded by "
                 "their standalone walls (dispatch-inflated upper "
                 "bounds), remainder = conv-pipeline scheduling (VMEM "
                 "prefetch copy-dones in the breakdown) — PERF.md "
                 "'Train step tail' (round 5) argues why ~85-90 ms is "
                 "the practical floor of this arithmetic"),
    }
    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}", file=sys.stderr)

    import shutil
    shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
