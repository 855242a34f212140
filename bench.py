"""Benchmark: VisDrone eval throughput (images/sec/chip).

Protocol: the reference's eval pipeline — full-image CenterNet-hourglass
(2 stacks) forward + top-k decode + VisDrone post-processing per image —
at deployment settings (single scale, no TTA), in bfloat16 on one TPU
chip, at VisDrone's dominant val resolution (1360x765 -> 768x1408
bucket). Baseline: the reference's in-repo eval wall-clock, 548 val
images in ~110.65s => ~4.95 img/s on its GPU (scripts/CTNet/eval.py:
22-23; BASELINE.md pins why that figure is only physically consistent
with a single-forward-per-image protocol, making this the like-for-like
comparison).

Transport: images enter the chip as JPEG-native YUV 4:2:0 planes
(1.5 B/px; VisDrone JPEGs are 4:2:0, so half-res chroma is all the
source carries) and are reconstructed to RGB on device. Uploads are a
single serialized stream (concurrent device_puts contend on this rig's
tunnel) overlapping compute through a depth-6 pipeline.

Measurement: the weather-gated median-of-trials protocol, shared with
the flagship RRNet bench via benchlib.py (see its docstring for the
gating/abort semantics).

Prints ONE JSON line:
  {"metric": "eval_images_per_sec_per_chip", "value": N,
   "unit": "img/s", "vs_baseline": N / 4.952, ...}
"""

import json
import os
import sys
import time

import numpy as np

from benchlib import (BASELINE_IMG_PER_SEC, VAL_H, VAL_W, compute_ceiling,
                      val_resolution_variants, weather_gated_trials)

TIME_BUDGET = float(os.environ.get("BENCH_TIME_BUDGET", 1140.0))


def main():
    import jax

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.data.visdrone import VisDroneDataset
    from rrnet_tpu.evallib.infer import Evaluator
    from rrnet_tpu.models import build_model
    from rrnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "val.scales", (1.0,))
    cfg = cfglib.set_by_path(cfg, "val.flip_tta", False)
    model = build_model(cfg)

    repo = os.path.dirname(os.path.abspath(__file__))
    ds = VisDroneDataset(os.path.join(repo, "data", "demo"), split="")
    image = ds.load_image(ds.names[0])

    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(cfg.seed),
        np.zeros((1, 128, 128, 3), np.float32))

    ev = Evaluator(cfg, variables, model=model)

    batch = 16
    variants = val_resolution_variants(image, batch)

    # Warmup/compile (batch program).
    t0 = time.time()
    ev.predict_batch(variants)
    warmup = time.time() - t0

    stats = weather_gated_trials(ev, variants, time_budget=TIME_BUDGET,
                                 n_batches=8, depth=6)
    staged0 = stats.pop("staged0")
    median = stats.pop("median")

    result = {
        "metric": "eval_images_per_sec_per_chip",
        "value": median,
        "unit": "img/s",
        "vs_baseline": round(median / BASELINE_IMG_PER_SEC, 3),
        "best5_vs_baseline": round(
            stats["best5_window_median_img_per_sec"] / BASELINE_IMG_PER_SEC,
            3),
        **stats,
    }
    print(f"# single-scale @ {VAL_H}x{VAL_W} (bucket {staged0.bucket}): "
          f"warmup={warmup:.1f}s, median of "
          f"{len(stats['trial_img_per_sec'])} trials = "
          f"{median:.2f} img/s (best {stats['best_trial_img_per_sec']:.2f}), "
          f"transport={ev.transport} "
          f"{stats['transport_mb_per_batch']:.1f} MB/batch",
          file=sys.stderr)

    # Secondary: compute-only ceiling (input pre-staged on device) — on a
    # real TPU host the PCIe upload (~1.6MB/img yuv420) is negligible; in
    # this dev environment the host->device tunnel is bursty
    # (~25-1500 MB/s) and can cap the end-to-end number above.
    ceiling = compute_ceiling(ev, staged0, batch)
    result["compute_ceiling_img_per_sec"] = round(ceiling, 3)
    result["ceiling_vs_baseline"] = round(ceiling / BASELINE_IMG_PER_SEC, 3)
    print(f"# compute-only ceiling (device-resident input): "
          f"{ceiling:.2f} img/s ({ceiling / BASELINE_IMG_PER_SEC:.2f}x baseline)",
          file=sys.stderr)

    # Secondary: int8-PTQ compute ceiling (body convs on the MXU's
    # double-rate int8 path, one-batch calibration — scripts/bench_int8.py
    # has the full protocol incl. detection-agreement checks; SYNTH_AP.json
    # carries the AP-delta artifact). Headline `value` stays the bf16
    # parity path; this records the deployment-quantized ceiling next to
    # it. Never allowed to fail the bench.
    if os.environ.get("BENCH_INT8", "1") != "0":
        try:
            ev8 = Evaluator(cfg, variables, model=model, quantize="int8")
            ceiling8 = compute_ceiling(ev8, staged0, batch)
            result["int8_ceiling_img_per_sec"] = round(ceiling8, 3)
            result["int8_ceiling_vs_baseline"] = round(
                ceiling8 / BASELINE_IMG_PER_SEC, 3)
            print(f"# int8-PTQ ceiling: {ceiling8:.2f} img/s "
                  f"({ceiling8 / BASELINE_IMG_PER_SEC:.2f}x baseline)",
                  file=sys.stderr)
        except Exception as e:  # pragma: no cover - defensive
            result["int8_ceiling_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(result))

    # Secondary: full competition TTA protocol (12 forwards/image).
    if os.environ.get("BENCH_FULL_TTA"):
        cfg2 = cfglib.centernet_config()
        ev2 = Evaluator(cfg2, variables, model=model)
        ev2.predict(variants[0])
        t0 = time.time()
        for _ in range(5):
            ev2.predict(variants[0])
        tta = 5 / (time.time() - t0)
        print(f"# full-TTA (6 scales x flip): {tta:.3f} img/s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
