#!/usr/bin/env python
"""Training entry point.

Replaces the reference's per-model scripts (`scripts/RRNet/train.py`,
`scripts/CTNet/train.py`, `scripts/RetinaNet/train.py` — each wiring a
Config to an operator + DistributedWrapper) with one CLI:

    python scripts/train.py --config rrnet [--steps N] [key=value ...]

e.g. python scripts/train.py --config centernet train.lr=1e-4 \
        model.backbone=hourglass

Multi-host: start one process per host after `jax.distributed.initialize`
(flag --multihost); the mesh spans all devices, each process feeds its
shard of the global batch.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="rrnet",
                    choices=["rrnet", "centernet", "retinanet"])
    ap.add_argument("--steps", type=int, default=None,
                    help="override train.iter_num")
    ap.add_argument("--resume", default=None,
                    help="checkpoint dir or ckp-N path to resume from")
    ap.add_argument("--multihost", action="store_true")
    ap.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = ap.parse_args()

    if args.multihost:
        import jax
        jax.distributed.initialize()

    import jax
    import numpy as np

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.data.loader import TrainLoader
    from rrnet_tpu.train import Trainer
    from rrnet_tpu.utils.logger import Logger
    from rrnet_tpu.utils import checkpoint as ckpt

    cfg = cfglib.PRESETS[args.config]()
    cfg = cfglib.apply_overrides(cfg, args.overrides)
    if args.steps is not None:
        cfg = cfglib.set_by_path(cfg, "train.iter_num", args.steps)

    main_proc = jax.process_index() == 0
    logger = Logger(cfg, main_process=main_proc)
    logger.init_timer(cfg.train.iter_num)

    trainer = Trainer(cfg)
    n_data = trainer.mesh.shape[cfg.mesh.data_axis]
    global_batch = cfg.train.batch_size * n_data
    local_batch = global_batch // jax.process_count()
    loader = TrainLoader(cfg, local_batch,
                         process_index=jax.process_index(),
                         process_count=jax.process_count())

    state = trainer.init_state()
    if args.resume:
        state = ckpt.restore_checkpoint(args.resume, state)
        print(f"resumed from step {int(state.step)}")

    running = {}
    start = int(state.step)
    for step in range(start, cfg.train.iter_num):
        batch = trainer.shard(loader.get_batch())
        state, metrics = trainer.train_step(state, batch)

        for k, v in metrics.items():
            running[k] = running.get(k, 0.0) + float(v)

        if main_proc and step % cfg.train.print_interval == \
                cfg.train.print_interval - 1:
            n = cfg.train.print_interval
            logger.log({"scalar": {
                **{f"train/{k}_loss" if k != "total" else "train/total_loss":
                   v / n for k, v in running.items()},
            }}, step)
            running = {}

        if main_proc and (
                step % cfg.train.checkpoint_interval ==
                cfg.train.checkpoint_interval - 1
                or step == cfg.train.iter_num - 1):
            path = ckpt.save_checkpoint(logger.log_dir, state)
            print(f"saved {path}")

    loader.close()
    logger.close()


if __name__ == "__main__":
    main()
