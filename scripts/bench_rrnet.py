"""RRNet (flagship, two-stage) eval throughput benchmark.

The headline bench (bench.py) records CenterNet; this records the
flagship RRNet path — stage-1 decode + per-class stage-1 NMS in the
device loop + static-budget ROI-align + stage-2 re-regression
(models/rrnet.py; reference models/rrnet.py:25-54) — at the same
protocol AND the same measurement harness: single scale, bf16, VisDrone
val resolution 765x1360 (768x1408 bucket), one TPU chip, end-to-end
throughput as the MEDIAN of weather-gated pipelined trials
(benchlib.weather_gated_trials — protocol-identical to bench.py by
construction). Writes RRNET_BENCH.json.

Both stage-1 NMS variants are measured: hard NMS (the preset default,
configs/rrnet_config.py:82 'nms') carries the weather-gated end-to-end
median; Pallas soft-NMS (nms_type_for_stage1='soft_nms', the
ext/cpu_soft_nms replacement) records its compute ceiling — its value
is staying in-graph, but hard NMS is both the reference default and the
faster stage-1 (NMS_BENCH.json), so it is the deployment setting.

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

from benchlib import (BASELINE_IMG_PER_SEC, VAL_H, VAL_W,  # noqa: E402
                      compute_ceiling, val_resolution_variants,
                      weather_gated_trials)

TIME_BUDGET = float(os.environ.get("BENCH_TIME_BUDGET", 900.0))


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
    batch = args.batch
    variants = val_resolution_variants(image, batch)

    result = {
        "device": jax.devices()[0].device_kind,
        "protocol": "RRNet-hourglass(2 stacks) single-scale bf16 @ "
                    f"{VAL_H}x{VAL_W} (768x1408 bucket), batch {batch}, "
                    "stage-1 topk=1500 -> per-class NMS -> 512 ROI "
                    "budget -> stage-2 re-regression",
        "baseline_img_per_sec": round(BASELINE_IMG_PER_SEC, 3),
        "measurement": "end-to-end = median of weather-gated pipelined "
                       "trials (benchlib, same harness as bench.py)",
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

        label = ("stage1_hard_nms" if nms_type == "nms"
                 else "stage1_pallas_soft_nms")
        entry = {
            "warmup_s": round(warmup, 1),
            "dets_per_img": int(preds[0].shape[0]),
        }

        ceil = compute_ceiling(ev, ev._upload(variants), batch)
        entry["compute_ceiling_img_per_sec"] = round(ceil, 3)
        entry["ceiling_vs_baseline"] = round(ceil / BASELINE_IMG_PER_SEC, 3)
        print(f"# {label}: ceiling {ceil:.2f} img/s "
              f"({ceil / BASELINE_IMG_PER_SEC:.2f}x)", file=sys.stderr)

        if nms_type == "nms":
            # the deployment variant carries the weather-gated e2e median
            stats = weather_gated_trials(ev, variants,
                                         time_budget=TIME_BUDGET,
                                         n_batches=8, depth=6)
            stats.pop("staged0")
            median = stats.pop("median")
            entry["end_to_end_img_per_sec_median"] = median
            entry["end_to_end_vs_baseline"] = round(
                median / BASELINE_IMG_PER_SEC, 3)
            entry.update(stats)
            print(f"# {label}: e2e median {median:.2f} img/s = "
                  f"{median / BASELINE_IMG_PER_SEC:.2f}x baseline "
                  f"({stats['aborted_trials']} aborted)", file=sys.stderr)

        if nms_type == "nms":
            # int8 PTQ ceiling for the flagship (auto-calibrated on the
            # first dispatched batch; AP delta gated in SYNTH_AP.json's
            # rrnet int8 row). Never allowed to fail the bench.
            try:
                ev8 = Evaluator(cfg, variables, model=model,
                                quantize="int8")
                ceil8 = compute_ceiling(ev8, ev8._upload(variants), batch)
                entry["int8_ceiling_img_per_sec"] = round(ceil8, 3)
                entry["int8_ceiling_vs_baseline"] = round(
                    ceil8 / BASELINE_IMG_PER_SEC, 3)
                print(f"# {label}: int8 ceiling {ceil8:.2f} img/s "
                      f"({ceil8 / BASELINE_IMG_PER_SEC:.2f}x)",
                      file=sys.stderr)
            except Exception as e:  # pragma: no cover - defensive
                entry["int8_ceiling_error"] = f"{type(e).__name__}: {e}"

        result["variants"][label] = entry

    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
