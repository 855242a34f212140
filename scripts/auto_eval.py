#!/usr/bin/env python
"""Auto-eval: checkpoint sweep x threshold grid search.

Mirrors the reference's auto_eval loop (scripts/RRNet/auto_eval.py:11-33
loops checkpoints, utils/metrics/metrics.py:254-305 grid-searches
score-threshold x soft-NMS-threshold on raw predictions).

Two modes:

  * threshold grid only, on an existing raw-prediction directory:
        python scripts/auto_eval.py --pred results/ \
            --gt data/DronesDET/val/annotations

  * full checkpoint sweep: run inference for EVERY checkpoint under a
    log dir through ONE Evaluator (weights swapped via
    Evaluator.update_variables, which drops the compiled-program cache
    because BN constants are baked in), then grid-search each:
        python scripts/auto_eval.py --config centernet \
            --ckpt-dir log/CenterNet --split val
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sweep_checkpoints(args):
    import jax.numpy as jnp

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.data.loader import ValLoader
    from rrnet_tpu.evallib.infer import Evaluator
    from rrnet_tpu.models import build_model
    from rrnet_tpu.train.state import create_train_state
    from rrnet_tpu.utils.cache import enable_compilation_cache
    from rrnet_tpu.utils import checkpoint as ckpt

    enable_compilation_cache()
    cfg = cfglib.PRESETS[args.config]()
    cfg = cfglib.apply_overrides(cfg, args.overrides)
    # raw (unfiltered) predictions so the grid search owns thresholds,
    # like the reference's auto_test=True (configs/rrnet_config.py:73)
    cfg = cfglib.set_by_path(cfg, "val.auto_test", True)

    model = build_model(cfg)
    state = create_train_state(cfg, model, jnp.zeros((1, 128, 128, 3)))
    steps = ckpt.available_steps(args.ckpt_dir)
    if not steps:
        sys.exit(f"no checkpoints under {args.ckpt_dir}")

    loader = ValLoader(cfg, split=args.split)
    ev = None
    per_ckpt = {}
    for step in steps:
        state = ckpt.restore_checkpoint(args.ckpt_dir, state, step=step)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if ev is None:
            ev = Evaluator(cfg, variables, model=model)
        else:
            ev.update_variables(variables)
        out_dir = os.path.join(args.ckpt_dir, f"auto_eval_{step}")
        ev.evaluate_split(loader, result_dir=out_dir,
                          batch_size=args.batch,
                          max_images=args.max_images, verbose=False)
        per_ckpt[step] = out_dir
        print(f"# ckp-{step}: raw predictions -> {out_dir}")
    gt = args.gt or os.path.join(cfg.data_root, args.split, "annotations")
    return per_ckpt, gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred", help="existing raw-prediction dir "
                                   "(threshold-grid-only mode)")
    ap.add_argument("--gt", help="GT annotation dir (defaults to "
                                 "<data_root>/<split>/annotations)")
    ap.add_argument("--config", default="centernet")
    ap.add_argument("--ckpt-dir", help="sweep every ckp-N under this dir")
    ap.add_argument("--split", default="val")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--score-grid", type=float, nargs="+",
                    default=[0.01, 0.05, 0.1])
    ap.add_argument("--nms-grid", type=float, nargs="+",
                    default=[0.1, 0.3, 0.5])
    ap.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = ap.parse_args()

    from rrnet_tpu.evallib.metrics import auto_evaluate_results

    if args.ckpt_dir:
        per_ckpt, gt = sweep_checkpoints(args)
    elif args.pred and args.gt:
        per_ckpt, gt = {None: args.pred}, args.gt
    else:
        sys.exit("need either --ckpt-dir (sweep mode) or --pred + --gt")

    best = (None, None, -1.0)
    for step, pred_dir in per_ckpt.items():
        for s in args.score_grid:
            for n in args.nms_grid:
                out = auto_evaluate_results(pred_dir, gt, s, n)
                tag = f"ckp-{step} " if step is not None else ""
                print(f"{tag}score_thr={s} nms_thr={n} AP={out['ap']:.4f}")
                if out["ap"] > best[2]:
                    best = (step, (s, n), out["ap"])
    tag = f"ckp-{best[0]} " if best[0] is not None else ""
    print(f"best: {tag}score_thr={best[1][0]} nms_thr={best[1][1]} "
          f"AP={best[2]:.4f}")


if __name__ == "__main__":
    main()
