#!/usr/bin/env python
"""Post-hoc threshold grid search (reference scripts/*/auto_eval.py +
utils/metrics/metrics.py:254-305): given a directory of raw (auto_test)
prediction txts, sweep score-threshold x soft-NMS-threshold and report
AP for each grid point.

    python scripts/auto_eval.py --pred results/ --gt data/DronesDET/val/annotations \
        --score-grid 0.01 0.05 0.1 --nms-grid 0.1 0.3 0.5
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--score-grid", type=float, nargs="+",
                    default=[0.01, 0.05, 0.1])
    ap.add_argument("--nms-grid", type=float, nargs="+",
                    default=[0.1, 0.3, 0.5])
    args = ap.parse_args()

    from rrnet_tpu.evallib.metrics import auto_evaluate_results

    best = (None, -1.0)
    for s in args.score_grid:
        for n in args.nms_grid:
            out = auto_evaluate_results(args.pred, args.gt, s, n)
            if out["ap"] > best[1]:
                best = ((s, n), out["ap"])
    print(f"best: score_thr={best[0][0]} nms_thr={best[0][1]} AP={best[1]:.4f}")


if __name__ == "__main__":
    main()
