"""Full competition-protocol TTA benchmark (TTA_BENCH.json).

The reference's actual eval protocol is 6 scales x horizontal flip = 12
forwards per image, run one batch-1 forward at a time
(operators/centernet_operator.py:266-283, configs/centernet_config.py:63).
This measures that protocol on one TPU chip in three configurations:

  * naive_batch1:  12 separate batch-1 programs per image — the shape of
                   the reference's loop (its per-forward cost, on us).
  * batched:       12 programs per BATCH of images (fuse_flip=False) —
                   what shape bucketing alone buys.
  * fused_flip:    6 programs per batch, each computing the unflipped
                   and flipped halves in one 2B forward
                   (Evaluator(fuse_flip=True), the default).

All numbers are compute ceilings (input staged on device), because TTA
reuses ONE upload for all 12 forwards — transport is amortized 12x and
never gates (see bench.py for the transport-bound single-scale story).

Usage: python scripts/bench_tta.py [--batch 8] [--out TTA_BENCH.json]
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

BASELINE_IMG_PER_SEC = 548.0 / 110.65   # single-scale protocol baseline
VAL_H, VAL_W = 765, 1360


def tta_rate(ev, images, reps=3):
    from rrnet_tpu.evallib.infer import StagedBatch
    staged = ev._upload(images)
    staged = StagedBatch(staged.payload, staged.bucket,
                         [(VAL_H, VAL_W)] * len(images), staged.tight)
    ev.collect(ev.dispatch_batch(staged))   # compile + warm
    t0 = time.time()
    for _ in range(reps):
        ev.collect(ev.dispatch_batch(staged))
    return reps * len(images) / (time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(REPO, "TTA_BENCH.json"))
    args = ap.parse_args()

    import jax

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.data.visdrone import VisDroneDataset
    from rrnet_tpu.evallib.infer import Evaluator
    from rrnet_tpu.models import build_model
    from rrnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    ds = VisDroneDataset(os.path.join(REPO, "data", "demo"), split="")
    image = ds.load_image(ds.names[0])
    if image.shape[:2] != (VAL_H, VAL_W):
        image = np.asarray(
            jax.image.resize(image.astype(np.float32), (VAL_H, VAL_W, 3),
                             method="bilinear")).clip(0, 255).astype(np.uint8)
    rng = np.random.RandomState(0)
    variants = [np.roll(image, tuple(rng.randint(0, 16, 2)), axis=(0, 1))
                for _ in range(args.batch)]

    cfg = cfglib.centernet_config()   # full protocol: 6 scales + flip TTA
    model = build_model(cfg)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(cfg.seed), np.zeros((1, 128, 128, 3), np.float32))

    result = {
        "device": jax.devices()[0].device_kind,
        "protocol": "CenterNet-hourglass(2 stacks) bf16, FULL reference "
                    f"TTA: scales {tuple(cfg.val.scales)} x hflip = "
                    f"{2 * len(cfg.val.scales)} forwards/img @ "
                    f"{VAL_H}x{VAL_W}",
        "single_scale_baseline_img_per_sec": round(BASELINE_IMG_PER_SEC, 3),
    }

    print("# naive batch-1 (the reference's loop shape)...", file=sys.stderr)
    ev1 = Evaluator(cfg, variables, model=model, fuse_flip=False)
    naive = tta_rate(ev1, variants[:1], reps=3)
    result["naive_batch1_img_per_sec"] = round(naive, 3)

    print(f"# batched (batch {args.batch}, 12 programs)...", file=sys.stderr)
    evb = Evaluator(cfg, variables, model=model, fuse_flip=False)
    batched = tta_rate(evb, variants)
    result["batched_img_per_sec"] = round(batched, 3)

    print(f"# fused flip (batch {args.batch}, 6 programs of 2B)...",
          file=sys.stderr)
    evf = Evaluator(cfg, variables, model=model, fuse_flip=True)
    fused = tta_rate(evf, variants)
    result["fused_flip_img_per_sec"] = round(fused, 3)
    result["fused_vs_naive_batch1"] = round(fused / naive, 2)

    # Protocol FLOP ceiling: 12 forwards/img at areas sum(2*s^2) of the
    # single-scale cost. With the measured single-scale batch-16
    # ceiling C img/s, the best possible full-TTA rate is
    # C / sum(2*s^2) — record it so the fused number is judged against
    # what the protocol physically allows, not an arbitrary multiple.
    area_units = sum(2.0 * s * s for s in cfg.val.scales)
    evs = Evaluator(cfglib.apply_overrides(
        cfg, ["val.scales=(1.0,)", "val.flip_tta=False"]),
        variables, model=model)
    single = tta_rate(evs, (variants * 2)[:16])
    result["single_scale_batch16_img_per_sec"] = round(single, 3)
    result["tta_area_units"] = round(area_units, 2)
    result["tta_flop_ceiling_img_per_sec"] = round(single / area_units, 3)
    result["fused_vs_flop_ceiling"] = round(
        fused / (single / area_units), 3)

    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
