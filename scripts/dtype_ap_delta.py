"""bf16-vs-f32 AP delta harness.

The framework computes in bfloat16 by default (config.ModelConfig.dtype)
— the MXU's native fast dtype — while the reference ran float32
(no AMP anywhere in its operators). This harness carries the evidence
for that default: train once on the demo fixture through the real
train -> decode -> txt -> AP loop (the round-1 overfit validation
protocol), then evaluate the SAME weights with the compute dtype set to
bfloat16 and to float32, and record both APs + the delta into
DTYPE_DELTA.json. Params are float32 either way (param_dtype), so the
two evals differ only in activation/compute precision.

Usage: python scripts/dtype_ap_delta.py [--steps 600] [--out DTYPE_DELTA.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_demo(cfg, steps: int):
    """Overfit the demo fixture for `steps` iterations; returns variables."""
    from rrnet_tpu.data.loader import DevicePrefetcher, TrainLoader
    from rrnet_tpu.train import Trainer

    trainer = Trainer(cfg)
    loader = DevicePrefetcher(
        TrainLoader(cfg, cfg.train.batch_size), trainer.shard)
    state = trainer.init_state()
    for step in range(steps):
        state, metrics = trainer.train_step(state, loader.get_batch())
        if step % 100 == 99:
            print(f"step {step + 1}: total={float(metrics['total']):.4f}")
    loader.close()
    total = float(metrics["total"])
    assert np.isfinite(total), f"non-finite final loss {total}"
    return {"params": state.params, "batch_stats": state.batch_stats}, total


def eval_ap(cfg, variables, dtype: str) -> dict:
    from rrnet_tpu import config as cfglib
    from rrnet_tpu.data.loader import ValLoader
    from rrnet_tpu.evallib.infer import Evaluator
    from rrnet_tpu.evallib.metrics import evaluate_results

    cfg = cfglib.set_by_path(cfg, "model.dtype", dtype)
    loader = ValLoader(cfg, split="val")
    ev = Evaluator(cfg, variables)
    with tempfile.TemporaryDirectory() as tmp:
        ev.evaluate_split(loader, result_dir=tmp, verbose=False)
        gt_dir = os.path.join(cfg.data_root, "val", "annotations")
        out = evaluate_results(tmp, gt_dir, verbose=False)
    return {k: round(float(v), 4) for k, v in out.items()
            if np.isscalar(v) or getattr(v, "ndim", 1) == 0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--config", default="centernet")
    ap.add_argument("--out", default="DTYPE_DELTA.json")
    args = ap.parse_args()

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    cfg = cfglib.PRESETS[args.config]()
    cfg = cfglib.apply_overrides(cfg, [
        "data_root=./data/demo",
        f"train.iter_num={args.steps}",
        "train.batch_size=2",
    ])

    variables, final_loss = train_demo(cfg, args.steps)

    results = {"config": args.config, "steps": args.steps,
               "final_loss": round(final_loss, 4)}
    for dtype in ("bfloat16", "float32"):
        r = eval_ap(cfg, variables, dtype)
        results[dtype] = r
        print(f"{dtype}: AP={r['ap']:.4f} AP50={r['ap50']:.4f}")
    results["ap_delta_f32_minus_bf16"] = round(
        results["float32"]["ap"] - results["bfloat16"]["ap"], 4)
    results["ap50_delta_f32_minus_bf16"] = round(
        results["float32"]["ap50"] - results["bfloat16"]["ap50"], 4)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {args.out}: delta(AP) = "
          f"{results['ap_delta_f32_minus_bf16']}")


if __name__ == "__main__":
    main()
