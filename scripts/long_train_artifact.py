#!/usr/bin/env python
"""Summarize a long synthetic training run -> LONG_TRAIN.json.

The synthetic gate (SYNTH_AP.json) runs <=1600 steps; nothing else
exercises the production schedule machinery end-to-end: LR milestones
firing mid-run, checkpoint save at interval, RESUME from a mid-run
checkpoint (the capability the reference lacks — it can only load
weights for eval, operators/base_operator.py:43-51), multi-thousand-
epoch loader reshuffle, and long-schedule stage-2 behavior. This script
parses the two train invocations' logs (fresh 0->N, resumed N->2N),
evals the final checkpoint, and writes the evidence as one artifact.

Usage:
    python scripts/long_train_artifact.py --log-dir /tmp/long_train_log/RRNetLong \
        --log-a /tmp/long_train_a.log --log-b /tmp/long_train_b.log \
        [--data /tmp/rrnet_synth] [--out LONG_TRAIN.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_log_txt(path):
    rows = []
    pat = re.compile(r"step (\d+):.*train/total_loss=([0-9.]+)")
    spat = re.compile(r"step (\d+):.*train/s2_loss=([0-9.]+)")
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                step, total = int(m.group(1)), float(m.group(2))
                m2 = spat.search(line)
                rows.append((step, total,
                             float(m2.group(2)) if m2 else None))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-dir", required=True)
    ap.add_argument("--log-a", required=True)
    ap.add_argument("--log-b", required=True)
    ap.add_argument("--data", default="/tmp/rrnet_synth")
    ap.add_argument("--out", default=os.path.join(REPO, "LONG_TRAIN.json"))
    args = ap.parse_args()

    rows = parse_log_txt(os.path.join(args.log_dir, "log.txt"))
    # invocation A must be the FRESH run: refuse to stamp the artifact
    # if its log carries a resume marker (wrong log passed, or the
    # "fresh" run actually resumed from a stale checkpoint dir)
    for line in open(args.log_a, errors="replace"):
        m = re.search(r"resumed from step (\d+)", line)
        if m:
            raise SystemExit(
                f"--log-a contains a resume marker (step {m.group(1)}) "
                "but must be the fresh run's log")
    resumed_at = None
    for line in open(args.log_b, errors="replace"):
        m = re.search(r"resumed from step (\d+)", line)
        if m:
            resumed_at = int(m.group(1))
    ckpts = sorted(int(d.split("-")[1]) for d in os.listdir(args.log_dir)
                   if d.startswith("ckp-"))

    # eval the final checkpoint on the held-out synthetic val
    import jax
    import numpy as np

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.data.loader import ValLoader
    from rrnet_tpu.evallib.infer import Evaluator
    from rrnet_tpu.evallib.metrics import evaluate_results
    from rrnet_tpu.train import Trainer
    from rrnet_tpu.utils import checkpoint as ckpt
    from rrnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = cfglib.PRESETS["rrnet"]()
    cfg = cfglib.apply_overrides(cfg, [
        f"data_root={args.data}", "train.batch_size=8",
        "train.stage2_warmup_steps=2000",
        "train.lr_milestones=(6000,8000)",
        "val.scales=(1.0,)", "val.flip_tta=False",
    ])
    trainer = Trainer(cfg)
    state = trainer.init_state()
    state = ckpt.restore_checkpoint(args.log_dir, state)
    final_step = int(state.step)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ev = Evaluator(cfg, variables, model=trainer.model)
    result_dir = ev.evaluate_split(
        ValLoader(cfg, split="val"),
        result_dir="/tmp/long_train_results", batch_size=4, verbose=False)
    scores = evaluate_results(result_dir,
                              os.path.join(args.data, "val", "annotations"))

    # LR actually applied at representative steps (schedule parity:
    # milestones fire mid-run, incl. across the resume boundary)
    lr_points = {}
    if state.schedule is not None:
        import jax.numpy as jnp
        for s in (0, 2000, 5999, 6000, 7999, 8000, 9999):
            lr_points[str(s)] = float(state.schedule(jnp.asarray(s)))

    loss_track = [{"step": s, "total": t, "s2": s2}
                  for s, t, s2 in rows if (s + 1) % 1000 == 0 or s < 400]

    result = {
        "protocol": "rrnet synthetic 10k-step schedule, batch 8, "
                    "stage-2 warmup 2000 (the reference's gate value), "
                    "LR milestones (6000, 8000) x0.1, checkpoint every "
                    "2500 steps, RESUMED from the step-5000 checkpoint "
                    "in a second process",
        "resumed_from_step": resumed_at,
        "checkpoints": ckpts,
        "final_step": final_step,
        "lr_schedule_points": lr_points,
        "loss_track": loss_track,
        "final_eval": {"AP": round(float(scores["ap"]), 4),
                       "AP50": round(float(scores["ap50"]), 4),
                       "AP75": round(float(scores["ap75"]), 4),
                       "AR": round(float(scores["ar"]), 4)},
        "reference_gate_1600_steps_AP": "SYNTH_AP.json rrnet entry",
        "note": "wall time on this rig is host-loader-bound (single "
                "CPU core runs the full FillDuck/RandomCrop transform "
                "chain in Python); device step time is the TPU_GATE "
                "number (134 ms at batch 8).",
    }
    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
