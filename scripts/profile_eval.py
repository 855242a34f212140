"""Profile the single-scale eval forward on the real TPU (the program
behind bench.py's compute ceiling) and print per-op device-time tables.

Same xplane parsing as profile_train.py; input is staged on device so
the trace contains pure compute.

Usage:
    python scripts/profile_eval.py [--batch 16] [--reps 4] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VAL_H, VAL_W = 765, 1360


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--family", default="centernet",
                    choices=["centernet", "rrnet"])
    ap.add_argument("--trace-dir", default=None)
    args = ap.parse_args()

    import jax

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.data.visdrone import VisDroneDataset
    from rrnet_tpu.evallib.infer import Evaluator, StagedBatch
    from rrnet_tpu.models import build_model
    from rrnet_tpu.utils.cache import enable_compilation_cache
    from scripts.profile_train import categorize, parse_xplane

    enable_compilation_cache()
    cfg = cfglib.PRESETS[args.family]()
    cfg = cfglib.set_by_path(cfg, "val.scales", (1.0,))
    cfg = cfglib.set_by_path(cfg, "val.flip_tta", False)
    model = build_model(cfg)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(cfg.seed), np.zeros((1, 128, 128, 3), np.float32))
    ev = Evaluator(cfg, variables, model=model)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds = VisDroneDataset(os.path.join(repo, "data", "demo"), split="")
    image = ds.load_image(ds.names[0])
    if image.shape[:2] != (VAL_H, VAL_W):
        image = np.asarray(jax.image.resize(
            image.astype(np.float32), (VAL_H, VAL_W, 3),
            method="bilinear")).clip(0, 255).astype(np.uint8)
    imgs = [image] * args.batch
    staged = ev._upload(imgs)
    staged = StagedBatch(staged.payload, staged.bucket,
                         [(VAL_H, VAL_W)] * args.batch, staged.tight)
    ev.collect(ev.dispatch_batch(staged))   # compile + warm

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="evalprof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.reps):
            ev.collect(ev.dispatch_batch(staged))

    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb*"),
                      recursive=True)
    agg = collections.defaultdict(lambda: [0, 0])
    for f in files:
        for name, ns, cnt in parse_xplane(f):
            agg[name][0] += ns
            agg[name][1] += cnt

    total_ns = sum(v[0] for v in agg.values())
    per_rep = total_ns / 1e6 / args.reps
    print(f"\n== device time: {per_rep:.2f} ms/batch{args.batch} = "
          f"{args.batch / (per_rep / 1e3):.1f} img/s ceiling-equivalent ==")
    cats = collections.Counter()
    for name, (ns, _) in agg.items():
        cats[categorize(name)] += ns
    print("\nby category (ms/batch, %):")
    for c, ns in cats.most_common():
        print(f"  {c:16s} {ns / 1e6 / args.reps:8.2f}  "
              f"{100.0 * ns / total_ns:5.1f}%")
    print(f"\ntop {args.top} ops (ms/batch, calls):")
    for name, (ns, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[
            :args.top]:
        print(f"  {ns / 1e6 / args.reps:8.3f}  {cnt // args.reps:4d}  "
              f"{name[:110]}")
    if not args.trace_dir:
        import shutil
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
