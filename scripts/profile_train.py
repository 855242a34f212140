"""Profile the jitted train step on the real TPU and summarize device time.

Captures a jax.profiler trace of a few train steps (synthetic VisDrone-
shaped batches, same protocol as scripts/tpu_gate.py), parses the
XPlane protobuf, and prints per-op-category and per-op device-time
tables. This is the tool behind PERF.md's train-step breakdowns.

Usage:
    python scripts/profile_train.py [--family centernet] [--batch 4]
        [--size 512] [--steps 5] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import os
import re
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(path):
    """Return [(op_name, duration_ns, count)] aggregated over the device
    planes of one .xplane.pb trace file."""
    import importlib

    xplane_pb2 = None
    for modpath in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                    "tensorflow.core.profiler.protobuf.xplane_pb2",
                    "tsl.profiler.protobuf.xplane_pb2",
                    "xprof.protobuf.xplane_pb2"):
        try:
            xplane_pb2 = importlib.import_module(modpath)
            break
        except ImportError:
            continue
    if xplane_pb2 is None:
        raise ImportError("no xplane_pb2 protobuf module found")

    raw = open(path, "rb").read()
    if path.endswith(".gz"):
        raw = gzip.decompress(raw)
    space = xplane_pb2.XSpace()
    space.ParseFromString(raw)

    totals = collections.Counter()
    counts = collections.Counter()
    for plane in space.planes:
        # device planes are named like '/device:TPU:0' (or TFRT variants)
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        if "Host" in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            # The synchronous "XLA Ops" line is wall-time-accurate; the
            # "Async XLA Ops" line holds in-flight DMAs (slice-start /
            # copy-start) whose durations OVERLAP compute — summing them
            # double-counts, so they are excluded here.
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                totals[name] += ev.duration_ps // 1000
                counts[name] += 1
    return [(n, totals[n], counts[n]) for n in totals]


def categorize(name: str) -> str:
    n = name.lower()
    if "conv" in n:
        return "conv"
    if re.search(r"\bdot\b|gemm|matmul", n):
        return "dot"
    if "fusion" in n:
        return "fusion"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/transpose"
    if "reduce" in n or "scatter" in n or "gather" in n or "sort" in n:
        return "reduce/gather"
    if "all-reduce" in n or "psum" in n or "collective" in n:
        return "collective"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="centernet",
                    choices=["centernet", "rrnet", "retinanet"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace-dir", default=None,
                    help="keep the raw trace here instead of a tmp dir")
    args = ap.parse_args()

    import jax

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.train import Trainer
    from rrnet_tpu.utils.cache import enable_compilation_cache
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

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="trainprof_")
    with jax.profiler.trace(trace_dir):
        for i in range(args.steps):
            state, metrics = trainer.train_step(state, batches[i % 3])
        float(metrics["total"])   # force completion inside the trace

    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb*"),
                      recursive=True)
    if not files:
        print(f"no xplane files under {trace_dir}", file=sys.stderr)
        sys.exit(1)
    rows = []
    for f in files:
        rows.extend(parse_xplane(f))

    agg = collections.defaultdict(lambda: [0, 0])
    for name, ns, cnt in rows:
        agg[name][0] += ns
        agg[name][1] += cnt

    total_ns = sum(v[0] for v in agg.values())
    per_step_ms = total_ns / 1e6 / args.steps
    print(f"\n== device time: {per_step_ms:.2f} ms/step "
          f"(family={args.family} batch={args.batch} size={args.size}, "
          f"{args.steps} steps) ==")

    cats = collections.Counter()
    for name, (ns, _) in agg.items():
        cats[categorize(name)] += ns
    print("\nby category (ms/step, % of device time):")
    for c, ns in cats.most_common():
        print(f"  {c:16s} {ns / 1e6 / args.steps:8.2f}  "
              f"{100.0 * ns / total_ns:5.1f}%")

    print(f"\ntop {args.top} ops (ms/step, calls/step):")
    for name, (ns, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[
            :args.top]:
        print(f"  {ns / 1e6 / args.steps:8.3f}  {cnt // args.steps:4d}  "
              f"{name[:110]}")
    if not args.trace_dir:
        import shutil
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
