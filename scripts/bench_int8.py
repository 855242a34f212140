"""int8 PTQ eval benchmark -> INT8_BENCH.json.

Measures the quantized eval path (Evaluator(quantize='int8'): body convs
on the v5e MXU's double-rate int8 path after one-batch calibration)
against the bf16 path at the headline bench protocol — CenterNet-
hourglass, single scale, batch 16 @ 768x1408 — and checks detection
agreement between the two paths on the same inputs.

Both ceilings are measured compute-only (all batches queued first, one
sync), the same protocol as bench.py's compute_ceiling, so the numbers
are directly comparable to EVAL_BENCH.json / BENCH_r*.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_IMG_PER_SEC = 548.0 / 110.65
VAL_H, VAL_W = 765, 1360
REPS = int(os.environ.get("INT8_BENCH_REPS", 20))


def _ceiling(ev, staged, batch, reps):
    """Queue `reps` dispatches of a staged batch, then one sync."""
    handle = ev.dispatch_batch(staged)   # warm/compile
    ev.collect(handle)
    t0 = time.perf_counter()
    handles = [ev.dispatch_batch(staged) for _ in range(reps)]
    for h in handles:
        ev.collect(h)
    dt = time.perf_counter() - t0
    return batch * reps / dt


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

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds = VisDroneDataset(os.path.join(repo, "data", "demo"), split="")
    image = ds.load_image(ds.names[0])
    if image.shape[:2] != (VAL_H, VAL_W):
        image = np.asarray(
            jax.image.resize(image.astype(np.float32), (VAL_H, VAL_W, 3),
                             method="bilinear")).clip(0, 255).astype(np.uint8)

    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(cfg.seed),
        np.zeros((1, 128, 128, 3), np.float32))

    rng = np.random.RandomState(0)
    batch = 16
    variants = [np.roll(image, tuple(rng.randint(0, 16, 2)), axis=(0, 1))
                for _ in range(batch)]

    ev_bf = Evaluator(cfg, variables, model=model)
    ev_i8 = Evaluator(cfg, variables, model=model, quantize="int8")

    staged = ev_bf._upload(variants)

    t0 = time.time()
    preds_bf = ev_bf.predict_batch(staged)
    bf_warm = time.time() - t0
    t0 = time.time()
    preds_i8 = ev_i8.predict_batch(staged)   # calibrates + compiles
    i8_warm = time.time() - t0
    n_quant = len(ev_i8._quant_scales)

    # agreement: strong detections (score > 0.3) must match 1:1 between
    # paths (class equal, center within 3 px). Untrained-weights scores
    # cluster near sigmoid(bias)=0.1, so fall back to top-50 by score.
    agree, total = 0, 0
    for p, q in zip(preds_bf, preds_i8):
        a = p[p[:, 4] > 0.3]
        b = q[q[:, 4] > 0.3]
        if len(a) == 0:
            a, b = p[:50], q[:50]
        total += len(a)
        for row in a:
            c = row[:2] + row[2:4] / 2
            d = np.linalg.norm(b[:, :2] + b[:, 2:4] / 2 - c, axis=1)
            j = int(np.argmin(d)) if len(d) else -1
            if j >= 0 and d[j] < 3.0 and b[j, 5] == row[5]:
                agree += 1

    ceil_bf = _ceiling(ev_bf, staged, batch, REPS)
    ceil_i8 = _ceiling(ev_i8, staged, batch, REPS)

    result = {
        "metric": "int8_eval_ceiling_img_per_sec",
        "value": round(ceil_i8, 2),
        "unit": "img/s",
        "vs_baseline": round(ceil_i8 / BASELINE_IMG_PER_SEC, 3),
        "bf16_ceiling_img_per_sec": round(ceil_bf, 2),
        "int8_speedup_vs_bf16": round(ceil_i8 / ceil_bf, 3),
        "quantized_convs": n_quant,
        "detection_agreement": round(agree / max(total, 1), 4),
        "detections_compared": total,
        "warmup_s": {"bf16": round(bf_warm, 1), "int8": round(i8_warm, 1)},
        "protocol": ("compute ceiling (queue-all), batch 16 @ 768x1408, "
                     "single scale, CenterNet-hourglass; int8 = PTQ body "
                     "convs, per-channel weights / per-tensor activations,"
                     " calibrated on the same batch"),
    }
    print(json.dumps(result))
    with open(os.path.join(repo, "INT8_BENCH.json"), "w") as f:
        json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
