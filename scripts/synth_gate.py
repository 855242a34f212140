#!/usr/bin/env python
"""Synthetic multi-image train->eval->AP regression gate (SYNTH_AP.json).

VisDrone is not in the image (zero egress), so real-data AP parity
cannot be measured here. This gate is the strongest in-environment
substitute: generate a deterministic 32+8-image VisDrone-format dataset
from the demo fixture (rrnet_tpu/data/synth.py), run a short REAL
training loop on the TPU through the full input pipeline (multi-epoch
reshuffle, MultiScale/MaskIgnore/FillDuck-with-roadmap/HFlip/RandomCrop
transforms, threaded prefetch), then run the full bucketed eval and the
VisDrone AP evaluator over the held-out val split, and persist the AP
so later rounds can regress against it.

Reference contract being exercised end-to-end: the train->eval->
evaluate_results loop (scripts/RRNet/eval.py:12-18, utils/metrics/
metrics.py:209-251).

Usage:
    python scripts/synth_gate.py [--steps 400] [--family centernet]
        [--dir /tmp/rrnet_synth] [--out SYNTH_AP.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TRAIN, N_VAL, SEED = 32, 8, 219


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--family", default="centernet",
                    choices=["centernet", "rrnet"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dir", default="/tmp/rrnet_synth")
    ap.add_argument("--out", default=os.path.join(REPO, "SYNTH_AP.json"))
    ap.add_argument("--int8-delta", action="store_true",
                    help="additionally eval the same weights with "
                         "quantize='int8' and record the AP delta")
    ap.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = ap.parse_args()

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.data.loader import DevicePrefetcher, TrainLoader, ValLoader
    from rrnet_tpu.data.synth import make_synth_dataset
    from rrnet_tpu.evallib.infer import Evaluator
    from rrnet_tpu.evallib.metrics import evaluate_results
    from rrnet_tpu.train import Trainer
    from rrnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    print(f"# generating {N_TRAIN}+{N_VAL} synthetic images under "
          f"{args.dir}", file=sys.stderr)
    make_synth_dataset(args.dir, n_train=N_TRAIN, n_val=N_VAL, seed=SEED)

    cfg = cfglib.PRESETS[args.family]()
    cfg = cfglib.apply_overrides(cfg, [
        f"data_root={args.dir}",
        f"train.batch_size={args.batch}",
        f"train.iter_num={args.steps}",
        # single-scale no-flip eval keeps the gate fast; the protocol is
        # recorded in the artifact so future rounds compare like-for-like
        "val.scales=(1.0,)",
        "val.flip_tta=False",
    ] + list(args.overrides))

    trainer = Trainer(cfg)
    state = trainer.init_state()
    loader = DevicePrefetcher(TrainLoader(cfg, args.batch), trainer.shard)

    t0 = time.time()
    metrics = None
    for step in range(args.steps):
        batch = loader.get_batch()
        state, metrics = trainer.train_step(state, batch)
        if step % 100 == 99:
            print(f"# step {step + 1}: total={float(metrics['total']):.4f}",
                  file=sys.stderr)
    total = float(metrics["total"])
    train_s = time.time() - t0
    loader.close()
    print(f"# trained {args.steps} steps in {train_s:.0f}s "
          f"(final loss {total:.4f})", file=sys.stderr)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ev = Evaluator(cfg, variables, model=trainer.model)
    val_loader = ValLoader(cfg, split="val")
    result_dir = ev.evaluate_split(
        val_loader, result_dir=os.path.join(args.dir, "results"),
        batch_size=4, verbose=False)
    scores = evaluate_results(
        result_dir, os.path.join(args.dir, "val", "annotations"))

    result = {
        "gate": "synthetic multi-image train->eval->AP",
        "dataset": {"n_train": N_TRAIN, "n_val": N_VAL, "seed": SEED,
                    "generator": "rrnet_tpu/data/synth.py"},
        "family": args.family,
        "train": {"steps": args.steps, "batch": args.batch,
                  "final_loss": round(total, 4),
                  "wall_s": round(train_s, 1)},
        "eval_protocol": "single scale, no flip TTA, bucketed batch 4",
        "AP": round(float(scores["ap"]), 4),
        "AP50": round(float(scores["ap50"]), 4),
        "AP75": round(float(scores["ap75"]), 4),
        "AR": round(float(scores["ar"]), 4),
    }

    if args.int8_delta:
        ev8 = Evaluator(cfg, variables, model=trainer.model,
                        quantize="int8")
        result_dir8 = ev8.evaluate_split(
            val_loader, result_dir=os.path.join(args.dir, "results_int8"),
            batch_size=4, verbose=False)
        scores8 = evaluate_results(
            result_dir8, os.path.join(args.dir, "val", "annotations"))
        result["int8"] = {
            "AP": round(float(scores8["ap"]), 4),
            "AP50": round(float(scores8["ap50"]), 4),
            "AP75": round(float(scores8["ap75"]), 4),
            "AR": round(float(scores8["ar"]), 4),
            "AP_delta_vs_bf16": round(
                float(scores8["ap"]) - float(scores["ap"]), 4),
            "quantized_convs": len(ev8._quant_scales or {}),
        }
    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
