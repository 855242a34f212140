#!/usr/bin/env python
"""Evaluation entry point (reference scripts/{RRNet,CTNet,RetinaNet}/eval.py).

    python scripts/eval.py --config rrnet --ckpt log/TwoStageNet \
        [--split val] [key=value ...]

Runs multi-scale (+flip for centernet) inference over the split, writes
VisDrone txt results, then scores them with the AP evaluator.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from rrnet_tpu import config as _cfglib

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="rrnet",
                    choices=sorted(_cfglib.PRESETS))
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint dir or ckp-N path")
    ap.add_argument("--split", default="val")
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--batch", type=int, default=4,
                    help="images per eval batch (per shape bucket)")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard eval batches over all local devices "
                         "(Mesh over the data axis); batch is rounded "
                         "up to a multiple of the device count")
    ap.add_argument("--no-score", action="store_true",
                    help="skip AP computation (txt only)")
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="int8 post-training quantization of the body "
                         "convs (calibrated on the first batch; the "
                         "v5e MXU's double-rate int8 path)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.data.loader import ValLoader
    from rrnet_tpu.evallib.infer import Evaluator
    from rrnet_tpu.evallib.metrics import evaluate_results
    from rrnet_tpu.models import build_model
    from rrnet_tpu.train.state import create_train_state
    from rrnet_tpu.utils.cache import enable_compilation_cache
    from rrnet_tpu.utils import checkpoint as ckpt

    enable_compilation_cache()

    cfg = cfglib.PRESETS[args.config]()
    cfg = cfglib.apply_overrides(cfg, args.overrides)

    model = build_model(cfg)
    import jax.numpy as jnp
    state = create_train_state(cfg, model, jnp.zeros((1, 128, 128, 3)))
    state = ckpt.restore_checkpoint(args.ckpt, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    mesh = None
    batch = args.batch
    if args.data_parallel:
        import numpy as np
        from jax.sharding import Mesh
        devs = jax.devices()
        mesh = Mesh(np.asarray(devs), ("data",))
        batch = -(-batch // len(devs)) * len(devs)

    loader = ValLoader(cfg, split=args.split)
    ev = Evaluator(cfg, variables, model=model, mesh=mesh,
                   quantize=args.quantize)
    result_dir = ev.evaluate_split(loader, max_images=args.max_images,
                                   batch_size=batch)

    if not args.no_score:
        gt_dir = os.path.join(cfg.data_root, args.split, "annotations")
        evaluate_results(result_dir, gt_dir)


if __name__ == "__main__":
    main()
