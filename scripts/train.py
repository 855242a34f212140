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


def _visualize_batch(trainer, state, batch, cfg):
    """Decode + draw predictions and GT for the first image of the batch
    (the reference's per-print_interval TensorBoard images,
    operators/centernet_operator.py:120-141)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rrnet_tpu.data.transforms import denormalize
    from rrnet_tpu.ops.heatmap import topk_decode
    from rrnet_tpu.utils.vis import visualize

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    img = np.asarray(batch["images"])[0:1]
    if img.ndim == 2:
        # packed YUV420 wire rows (train.transport='yuv420')
        from rrnet_tpu.data.yuv420 import yuv420_to_rgb_host
        h, w = cfg.train.crop_size
        q = h * w // 4
        y = img[:, :h * w].reshape(1, h, w)
        uv = np.stack([img[:, h * w:h * w + q].reshape(1, h // 2, w // 2),
                       img[:, h * w + q:].reshape(1, h // 2, w // 2)],
                      axis=-1)
        img = yuv420_to_rgb_host(y, uv)
    if img.dtype == np.uint8:
        base_u8 = img[0]
        mean = np.asarray(cfg.train.mean, np.float32)
        std = np.asarray(cfg.train.std, np.float32)
        img = (img.astype(np.float32) / 255.0 - mean) / std
    else:
        base_u8 = None
    outs = trainer.model.apply(variables, jnp.asarray(img), train=False)
    if cfg.model.name == "rrnet":
        hm, wh, off = outs.hms[-1], outs.whs[-1], outs.offsets[-1]
    elif cfg.model.name == "centernet":
        hm, wh, off = outs[0][-1], outs[1][-1], outs[2][-1]
    else:
        return []
    dets = topk_decode(hm.astype(jnp.float32), wh.astype(jnp.float32),
                       off.astype(jnp.float32), k=100,
                       scale_factor=float(cfg.train.scale_factor))
    boxes = np.asarray(dets.boxes[0])
    scores = np.asarray(dets.scores[0])
    classes = np.asarray(dets.classes[0]) + 1
    keep = scores > 0.25
    rows = np.concatenate([
        boxes[keep, :2], boxes[keep, 2:4] - boxes[keep, :2],
        scores[keep, None], classes[keep, None]], axis=1)

    base = (base_u8 if base_u8 is not None else
            (np.clip(denormalize(img[0]), 0, 1) * 255).astype(np.uint8))
    pred_img = visualize(base.copy(), rows, xywh=True, with_score=True)
    gt = np.asarray(batch["annos"])[0][np.asarray(batch["valid"])[0]]
    gt_img = visualize(base.copy(), gt[:, :6], xywh=True)
    return [pred_img.astype(np.float32) / 255.0,
            gt_img.astype(np.float32) / 255.0]


def main():
    from rrnet_tpu import config as _cfglib

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="rrnet",
                    choices=sorted(_cfglib.PRESETS))
    ap.add_argument("--steps", type=int, default=None,
                    help="override train.iter_num")
    ap.add_argument("--resume", default=None,
                    help="checkpoint dir or ckp-N path to resume from")
    ap.add_argument("--multihost", action="store_true")
    ap.add_argument("--log-images", action="store_true",
                    help="log pred/GT visualizations at print_interval "
                         "(reference operators/*:146-176)")
    ap.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = ap.parse_args()

    if args.multihost:
        import jax
        jax.distributed.initialize()

    import jax
    import numpy as np

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.data.loader import DevicePrefetcher, TrainLoader
    from rrnet_tpu.train import Trainer
    from rrnet_tpu.utils.cache import enable_compilation_cache
    from rrnet_tpu.utils.logger import Logger
    from rrnet_tpu.utils import checkpoint as ckpt

    enable_compilation_cache()

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
    loader = DevicePrefetcher(
        TrainLoader(cfg, local_batch,
                    process_index=jax.process_index(),
                    process_count=jax.process_count()),
        trainer.shard)

    state = trainer.init_state()
    if args.resume:
        state = ckpt.restore_checkpoint(args.resume, state)
        print(f"resumed from step {int(state.step)}")

    running = []   # device metric dicts — materialized only at print time
    start = int(state.step)
    for step in range(start, cfg.train.iter_num):
        batch = loader.get_batch()   # pre-sharded by DevicePrefetcher
        state, metrics = trainer.train_step(state, batch)
        # keep metrics as device arrays: forcing floats every step would
        # sync the host with the device and serialize the input pipeline
        running.append(metrics)

        if main_proc and step % cfg.train.print_interval == \
                cfg.train.print_interval - 1:
            n = len(running)
            sums = {}
            for m in running:
                for k, v in m.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
            log_data = {"scalar": {
                **{f"train/{k}_loss" if k != "total" else "train/total_loss":
                   v / n for k, v in sums.items()},
            }}
            if args.log_images:
                log_data["imgs"] = {"train": _visualize_batch(
                    trainer, state, batch, cfg)}
            logger.log(log_data, step)
            running = []

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
