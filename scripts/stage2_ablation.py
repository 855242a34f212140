#!/usr/bin/env python
"""Coarse-ROI stage-2 ablation -> STAGE2_ABLATION.json.

SYNTH_AP.json records that stage-2 re-regression LOSES AP on the easy
synthetic gate (stage-1 ROIs reach IoU~0.95, so residual targets are
sub-feature-pixel — see the gate note and PERF.md). This script commits
the complementary half of the story: in the regime the stage exists for
(coarse stage-1 boxes — on VisDrone, heatmap-decoded boxes err by
multiple feature pixels, operators/rrnet_operator.py:63-102), does the
trained head actually refine boxes?

Protocol: train RRNet on the synthetic gate dataset through the real
pipeline, then evaluate the held-out val images with gaussian jitter
injected into the selected stage-1 ROIs (models/rrnet.py roi_jitter,
feature coords, deterministic seed) and compare the mean best-IoU of
kept boxes under the full stage-2 decode vs the SAME decode with zero
deltas. The zero-delta comparison isolates what the HEAD contributes;
both variants see identical jittered ROIs and the identical +1-extent
decode.

Usage: python scripts/stage2_ablation.py [--steps 800]
           [--out STAGE2_ABLATION.json]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800,
                    help="training steps; must be >= 1 (metrics come "
                         "from the last step)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dir", default="/tmp/rrnet_synth")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "STAGE2_ABLATION.json"))
    args = ap.parse_args()
    if args.steps < 1:
        ap.error("--steps must be >= 1")

    import jax
    import jax.numpy as jnp

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.data.loader import DevicePrefetcher, TrainLoader
    from rrnet_tpu.data.visdrone import (VisDroneDataset,
                                         parse_annotation_file)
    from rrnet_tpu.ops import box as boxops
    from rrnet_tpu.train import Trainer
    from rrnet_tpu.data.synth import make_synth_dataset
    from rrnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    make_synth_dataset(args.dir, n_train=32, n_val=8, seed=219)

    cfg = cfglib.rrnet_config()
    cfg = cfglib.apply_overrides(cfg, [
        f"data_root={args.dir}",
        f"train.batch_size={args.batch}",
        f"train.iter_num={args.steps}",
        f"train.stage2_warmup_steps={args.steps // 4}",
    ])
    trainer = Trainer(cfg)
    state = trainer.init_state()
    loader = DevicePrefetcher(TrainLoader(cfg, args.batch), trainer.shard)
    t0 = time.time()
    for step in range(args.steps):
        state, metrics = trainer.train_step(state, loader.get_batch())
        if step % 200 == 199:
            print(f"# step {step + 1}: {float(metrics['total']):.4f}",
                  file=sys.stderr)
    loader.close()
    train_s = time.time() - t0
    print(f"# trained {args.steps} steps in {train_s:.0f}s", file=sys.stderr)

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # Val images, single bucket: resize-pad to the train crop so one
    # compiled apply covers all 8 (the ablation metric is IoU in this
    # canvas; both decode variants share it).
    ds = VisDroneDataset(args.dir, split="val")
    ch, cw = cfg.train.crop_size
    mean = np.asarray(cfg.train.mean, np.float32)
    std = np.asarray(cfg.train.std, np.float32)
    imgs, annos, valids = [], [], []
    max_n = 0
    raw = []
    for name in ds.names:
        img = ds.load_image(name)
        ann = parse_annotation_file(
            os.path.join(ds.annotations_dir, name + ".txt"))
        raw.append((img, ann))
        max_n = max(max_n, len(ann))
    for img, ann in raw:
        h, w = img.shape[:2]
        s = min(ch / h, cw / w)
        nh, nw = int(round(h * s)), int(round(w * s))
        import cv2
        resized = cv2.resize(img, (nw, nh))
        canvas = np.zeros((ch, cw, 3), img.dtype)
        canvas[:nh, :nw] = resized
        boxes = ann[:, :4].astype(np.float32) * s
        a = np.zeros((max_n, 4), np.float32)
        v = np.zeros((max_n,), bool)
        a[:len(boxes)] = boxes
        v[:len(boxes)] = True
        imgs.append((canvas.astype(np.float32) / 255.0 - mean) / std)
        annos.append(a)
        valids.append(v)
    x = jnp.asarray(np.stack(imgs))
    gt_xyxy = boxops.xywh_to_xyxy(jnp.asarray(np.stack(annos)))
    valid = jnp.asarray(np.stack(valids))

    model = trainer.model
    sf = float(cfg.train.scale_factor)
    rng = np.random.RandomState(7)

    @jax.jit
    def run(variables, x, gt_xyxy, valid, jit_arr):
        outs = model.apply(variables, x, train=False, roi_jitter=jit_arr)
        rois_in = outs.rois * sf
        rois_xywh = jnp.concatenate(
            [rois_in[..., :2], rois_in[..., 2:4] - rois_in[..., :2]], -1)
        full = boxops.decode_boxes(rois_xywh, outs.stage2_reg)
        zero = boxops.decode_boxes(rois_xywh, jnp.zeros_like(outs.stage2_reg))

        def miou(xywh):
            xyxy = jnp.concatenate(
                [xywh[..., :2], xywh[..., :2] + xywh[..., 2:4]], -1)
            i = jax.vmap(boxops.pairwise_iou)(xyxy, gt_xyxy)
            i = jnp.where(valid[:, None, :], i, 0.0)
            best = jnp.max(i, axis=-1)
            w = outs.roi_valid & (outs.roi_scores > 0.2)
            return jnp.sum(best * w) / jnp.maximum(jnp.sum(w), 1)

        return miou(full), miou(zero)

    rows = []
    r = cfg.model.stage2_rois
    for jit_fpx in (0.0, 0.5, 1.0, 2.0):
        jit = jnp.asarray(
            rng.randn(x.shape[0], r, 4) * jit_fpx, jnp.float32)
        f, z = run(variables, x, gt_xyxy, valid, jit)
        row = {"jitter_feature_px": jit_fpx,
               "stage2_mean_iou": round(float(f), 4),
               "zero_delta_mean_iou": round(float(z), 4),
               "stage2_gain": round(float(f) - float(z), 4)}
        rows.append(row)
        print(f"# jitter {jit_fpx}: full {row['stage2_mean_iou']} zero "
              f"{row['zero_delta_mean_iou']} gain {row['stage2_gain']:+}",
              file=sys.stderr)

    result = {
        "ablation": "coarse-ROI stage-2 refinement (roi_jitter)",
        "protocol": f"RRNet trained {args.steps} steps (stage-2 warmup "
                    f"{args.steps // 4}) on the synthetic gate dataset; "
                    "held-out val (8 images) evaluated with gaussian "
                    "jitter on the selected stage-1 ROIs (feature "
                    "coords, seed 7); metric = mean best-IoU of kept "
                    "boxes (score>0.2) vs GT, full stage-2 decode vs "
                    "zero-delta decode on IDENTICAL jittered ROIs",
        "train": {"steps": args.steps, "wall_s": round(train_s, 1),
                  "final_loss": round(float(metrics["total"]), 4)},
        "rows": rows,
        "reference": "operators/rrnet_operator.py:63-102 (stage-2 "
                     "matching/targets), :188-209 (decode)",
    }
    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
