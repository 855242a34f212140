#!/usr/bin/env python
"""Anchor-prior k-means over training GT sizes (reference
scripts/kmeans.py + ext/kmeans — reference results for VisDrone:
heights {20.38, 73.23, 182.68}, widths {21.98, 63.83, 155.88}).

    python scripts/kmeans.py --config retinanet [--k 3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="retinanet")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--batches", type=int, default=200)
    args = ap.parse_args()

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.data.loader import TrainLoader
    from rrnet_tpu.ops.kmeans import anchor_priors_from_dataset

    cfg = cfglib.PRESETS[args.config]()
    loader = TrainLoader(cfg, batch_size=8)
    try:
        hs, ws = anchor_priors_from_dataset(loader, k=args.k,
                                            max_batches=args.batches)
    finally:
        loader.close()
    print("height priors:", hs)
    print("width priors:", ws)


if __name__ == "__main__":
    main()
