"""RRNet (flagship, two-stage) eval throughput benchmark.

The headline bench (bench.py) records CenterNet; this records the
flagship RRNet path — stage-1 decode + per-class stage-1 NMS in the
device loop + static-budget ROI-align + stage-2 re-regression
(models/rrnet.py; reference models/rrnet.py:25-54) — at the same
protocol: single scale, bf16, VisDrone val resolution 765x1360
(768x1408 bucket), one TPU chip. Writes RRNET_BENCH.json (r2 verdict:
the flagship path had no recorded eval throughput artifact).

Both stage-1 NMS variants are measured: hard NMS (the preset default,
configs/rrnet_config.py:82 'nms') and Pallas soft-NMS
(nms_type_for_stage1='soft_nms', the ext/cpu_soft_nms replacement).

Reports the compute-only ceiling (device-resident input; the number a
real TPU host's PCIe sustains) and a short end-to-end pipelined run at
whatever transport weather the rig offers (informational — bench.py
owns the weather-gated end-to-end protocol).

Usage: python scripts/bench_rrnet.py [--out RRNET_BENCH.json]
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

BASELINE_IMG_PER_SEC = 548.0 / 110.65   # reference scripts/CTNet/eval.py:22-23
VAL_H, VAL_W = 765, 1360


def ceiling_img_per_sec(ev, staged, batch, m=10):
    from rrnet_tpu.evallib.infer import StagedBatch
    staged = StagedBatch(staged.payload, staged.bucket,
                         [(VAL_H, VAL_W)] * batch, staged.tight)
    ev.collect(ev.dispatch_batch(staged))   # warm
    t0 = time.time()
    prev = None
    for _ in range(m):
        handle = ev.dispatch_batch(staged)
        if prev is not None:
            ev.collect(prev)
        prev = handle
    ev.collect(prev)
    return m * batch / (time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "RRNET_BENCH.json"))
    ap.add_argument("--batch", type=int, default=8)
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
    batch = args.batch
    variants = [np.roll(image, tuple(rng.randint(0, 16, 2)), axis=(0, 1))
                for _ in range(batch)]

    result = {
        "device": jax.devices()[0].device_kind,
        "protocol": "RRNet-hourglass(2 stacks) single-scale bf16 @ "
                    f"{VAL_H}x{VAL_W} (768x1408 bucket), batch {batch}, "
                    "stage-1 topk=1500 -> per-class NMS -> 512 ROI "
                    "budget -> stage-2 re-regression",
        "baseline_img_per_sec": round(BASELINE_IMG_PER_SEC, 3),
        "variants": {},
    }

    variables = None
    for nms_type in ("nms", "soft_nms"):
        cfg = cfglib.rrnet_config()
        cfg = cfglib.set_by_path(cfg, "val.scales", (1.0,))
        cfg = cfglib.set_by_path(cfg, "model.nms_type_for_stage1", nms_type)
        model = build_model(cfg)
        if variables is None:
            variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
                jax.random.PRNGKey(cfg.seed),
                np.zeros((1, 128, 128, 3), np.float32))
        ev = Evaluator(cfg, variables, model=model)

        t0 = time.time()
        preds = ev.predict_batch(variants)
        warmup = time.time() - t0

        ceil = ceiling_img_per_sec(ev, ev._upload(variants), batch)

        # short end-to-end pipelined run (weather-dependent, see bench.py)
        from concurrent.futures import ThreadPoolExecutor
        uploader = ThreadPoolExecutor(max_workers=1)
        n_batches = 6
        futs = [uploader.submit(ev._upload, variants)
                for _ in range(n_batches)]
        t0 = time.time()
        in_flight = []
        for i in range(n_batches):
            in_flight.append(ev.dispatch_batch(futs[i].result()))
            if len(in_flight) >= 4:
                ev.collect(in_flight.pop(0))
        while in_flight:
            ev.collect(in_flight.pop(0))
        e2e = n_batches * batch / (time.time() - t0)
        uploader.shutdown()

        label = ("stage1_hard_nms" if nms_type == "nms"
                 else "stage1_pallas_soft_nms")
        result["variants"][label] = {
            "compute_ceiling_img_per_sec": round(ceil, 3),
            "ceiling_vs_baseline": round(ceil / BASELINE_IMG_PER_SEC, 3),
            "end_to_end_img_per_sec_one_run": round(e2e, 3),
            "warmup_s": round(warmup, 1),
            "dets_per_img": int(preds[0].shape[0]),
        }
        print(f"# {label}: ceiling {ceil:.2f} img/s "
              f"({ceil / BASELINE_IMG_PER_SEC:.2f}x), e2e {e2e:.2f} img/s",
              file=sys.stderr)

    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
