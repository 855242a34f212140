"""Benchmark: VisDrone eval throughput (images/sec/chip).

Protocol: the reference's eval pipeline — full-image CenterNet-hourglass
(2 stacks) forward + top-k decode + VisDrone post-processing per image —
at deployment settings (single scale, no TTA), in bfloat16 on one TPU
chip. Baseline: the reference's in-repo eval wall-clock, 548 val images
in ~110.65s => ~4.95 img/s on its GPU (scripts/CTNet/eval.py:22-23; that
figure is only physically consistent with a single-forward-per-image
protocol, so this is the like-for-like comparison).

A secondary line on stderr reports the full competition TTA protocol
(6 scales x flip = 12 forwards/image), which costs ~19x the compute.

Prints ONE JSON line:
  {"metric": "eval_images_per_sec_per_chip", "value": N,
   "unit": "img/s", "vs_baseline": N / 4.952}
"""

import json
import os
import sys
import time

import numpy as np


BASELINE_IMG_PER_SEC = 548.0 / 110.65   # reference scripts/CTNet/eval.py:22-23


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
    image = ds.load_image(ds.names[0])   # raw uint8 1360x765 (VisDrone's
    # dominant val resolution); device normalizes

    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(cfg.seed),
        np.zeros((1, 128, 128, 3), np.float32))

    ev = Evaluator(cfg, variables, model=model)

    # Distinct image variants (random crops-shifts of the demo image) so
    # the pipeline cannot benefit from value caching.
    rng = np.random.RandomState(0)
    variants = []
    for _ in range(16):
        dy, dx = rng.randint(0, 16, 2)
        variants.append(np.roll(image, (dy, dx), axis=(0, 1)))

    batch = 16
    # Warmup/compile (batch program).
    t0 = time.time()
    ev.predict_batch(variants)
    warmup = time.time() - t0

    # Timed: 3-stage pipeline (upload thread -> compute -> host collect),
    # mirroring Evaluator.evaluate_split's execution pattern.
    import queue as queue_mod
    import threading

    n_batches = 8
    upq: "queue_mod.Queue" = queue_mod.Queue(maxsize=2)

    def uploader():
        for _ in range(n_batches):
            upq.put(ev._upload(variants))

    t0 = time.time()
    threading.Thread(target=uploader, daemon=True).start()
    prev = None
    preds = None
    for i in range(n_batches):
        handle = ev.dispatch_batch(upq.get())
        if prev is not None:
            preds = ev.collect(prev)
        prev = handle
    preds = ev.collect(prev)
    elapsed = time.time() - t0
    n = n_batches * batch
    img_per_sec = n / elapsed
    pred = preds[0]

    result = {
        "metric": "eval_images_per_sec_per_chip",
        "value": round(img_per_sec, 3),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
    }
    print(f"# single-scale: warmup={warmup:.1f}s, {n} imgs in "
          f"{elapsed:.2f}s, {len(pred)} dets/img", file=sys.stderr)

    # Secondary: compute-only ceiling (input pre-staged on device) — on a
    # real TPU host the PCIe upload (~3MB/img) is negligible; in this dev
    # environment the host->device tunnel (~20-60 MB/s, bursty) caps the
    # end-to-end number above.
    staged = ev._upload(variants)
    ev.collect(ev.dispatch_batch(staged))
    t0 = time.time()
    m = 10
    prev = None
    for _ in range(m):
        handle = ev.dispatch_batch(staged)
        if prev is not None:
            ev.collect(prev)
        prev = handle
    ev.collect(prev)
    ceiling = m * batch / (time.time() - t0)
    result["compute_ceiling_img_per_sec"] = round(ceiling, 3)
    result["ceiling_vs_baseline"] = round(ceiling / BASELINE_IMG_PER_SEC, 3)
    print(json.dumps(result))
    print(f"# compute-only ceiling (device-resident input): "
          f"{ceiling:.2f} img/s ({ceiling / BASELINE_IMG_PER_SEC:.2f}x baseline)",
          file=sys.stderr)

    # Secondary: full competition TTA protocol (12 forwards/image).
    if os.environ.get("BENCH_FULL_TTA"):
        cfg2 = cfglib.centernet_config()
        ev2 = Evaluator(cfg2, variables, model=model)
        ev2.predict(image)
        t0 = time.time()
        for _ in range(5):
            ev2.predict(image)
        tta = 5 / (time.time() - t0)
        print(f"# full-TTA (6 scales x flip): {tta:.3f} img/s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
