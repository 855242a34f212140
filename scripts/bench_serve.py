"""Serving latency benchmark -> SERVE_BENCH.json.

Measures the latency-oriented serving path (rrnet_tpu/serving.py) on one
TPU chip at the deployment setting (single scale, no TTA), CenterNet-
hourglass at VisDrone's dominant val resolution:

  * sequential warm single-image latency (stage + upload + forward +
    decode + host NMS), p50/p90/p99 over N requests;
  * compute-only latency (image pre-staged on device) — separates this
    rig's tunnel weather from the serving stack;
  * burst throughput through the MicroBatcher (dynamic batching).

Baseline: the reference eval loop's per-image wall clock — 548 images in
~110.65 s = 201.9 ms/img on its GPU (scripts/CTNet/eval.py:22-23).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_MS_PER_IMG = 110.65 / 548.0 * 1e3
VAL_H, VAL_W = 765, 1360
N_SEQ = int(os.environ.get("SERVE_BENCH_REQUESTS", 40))
N_BURST = int(os.environ.get("SERVE_BENCH_BURST", 48))


def main():
    import jax

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.data.visdrone import VisDroneDataset
    from rrnet_tpu.models import build_model
    from rrnet_tpu.serving import MicroBatcher, Predictor
    from rrnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = cfglib.centernet_config()
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

    pred = Predictor(cfg, variables, model=model,
                     image_shapes=((VAL_H, VAL_W),))

    rng = np.random.RandomState(0)

    def variant():
        dy, dx = rng.randint(0, 16, 2)
        return np.roll(image, (dy, dx), axis=(0, 1))

    def probe_bw(mb=8):
        buf = np.random.randint(0, 255, (mb * 1024 * 1024,), np.uint8)
        t0 = time.time()
        jax.device_put(buf).block_until_ready()
        return mb / (time.time() - t0)

    t0 = time.time()
    n_programs = pred.warmup(batch_sizes=(1, 8))
    warmup_s = time.time() - t0

    probes = [round(probe_bw(), 1)]

    # 1) sequential warm single-image latency (end to end)
    lat = []
    for _ in range(N_SEQ):
        img = variant()
        t0 = time.perf_counter()
        out = pred.predict(img)
        assert out.shape[1] == 6
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3

    probes.append(round(probe_bw(), 1))

    # 2) compute-only latency: image pre-staged on device, so the
    #    request pays forward + decode + fetch + host NMS only
    ev = pred._ev
    staged = ev._upload([image])
    comp = []
    for _ in range(N_SEQ):
        t0 = time.perf_counter()
        ev.collect(ev.dispatch_batch(staged))
        comp.append(time.perf_counter() - t0)
    comp_ms = np.asarray(comp) * 1e3

    # 3) burst throughput through the MicroBatcher
    burst_imgs = [variant() for _ in range(N_BURST)]
    with MicroBatcher(pred, max_batch=8, max_delay_ms=4.0) as mb:
        t0 = time.perf_counter()
        futs = [mb.submit(im) for im in burst_imgs]
        for f in futs:
            f.result()
        burst_s = time.perf_counter() - t0
        sizes = list(mb.batch_sizes)
    probes.append(round(probe_bw(), 1))

    # 4) streamed open-loop throughput at batch 1: the pipelined
    #    MicroBatcher overlaps the upload of request k+1 with the
    #    compute of request k, so the sustained per-request cost is
    #    max(upload, compute) instead of their sum (a closed-loop
    #    client — section 1 — cannot benefit: it only submits after
    #    the previous response).
    stream_imgs = [variant() for _ in range(N_SEQ)]
    with MicroBatcher(pred, max_batch=1, max_delay_ms=0.0,
                      pipeline_depth=2) as mb:
        t0 = time.perf_counter()
        futs = [mb.submit(im) for im in stream_imgs]
        for f in futs:
            f.result()
        stream_s = time.perf_counter() - t0
    stream_ms_per_img = stream_s / N_SEQ * 1e3
    probes.append(round(probe_bw(), 1))

    result = {
        "metric": "serve_latency_ms_p50",
        "value": round(float(np.percentile(lat_ms, 50)), 2),
        "unit": "ms",
        "vs_baseline": round(
            BASELINE_MS_PER_IMG / float(np.percentile(lat_ms, 50)), 3),
        "baseline_ms_per_img": round(BASELINE_MS_PER_IMG, 1),
        "requests": N_SEQ,
        "latency_ms": {
            "p50": round(float(np.percentile(lat_ms, 50)), 2),
            "p90": round(float(np.percentile(lat_ms, 90)), 2),
            "p99": round(float(np.percentile(lat_ms, 99)), 2),
            "mean": round(float(lat_ms.mean()), 2),
        },
        "compute_only_latency_ms": {
            "p50": round(float(np.percentile(comp_ms, 50)), 2),
            "p90": round(float(np.percentile(comp_ms, 90)), 2),
            "p99": round(float(np.percentile(comp_ms, 99)), 2),
        },
        "burst": {
            "requests": N_BURST,
            "img_per_sec": round(N_BURST / burst_s, 2),
            "batch_sizes": sizes,
            "max_batch": 8,
            "max_delay_ms": 4.0,
        },
        "streamed_batch1": {
            "requests": N_SEQ,
            "img_per_sec": round(N_SEQ / stream_s, 2),
            "ms_per_img": round(stream_ms_per_img, 2),
            "pipeline_depth": 2,
        },
        "warmup_s": round(warmup_s, 1),
        "compiled_programs": n_programs,
        "transport_probes_mb_per_sec": probes,
    }

    # wire-bound model: on this rig the closed-loop p50 must equal
    # upload + compute to within a few ms, and the streamed rate must
    # approach max(upload, compute) — proving the residual 2x gap to
    # compute-only is the wire, not the serving stack (PERF.md's eval
    # transport analysis, applied to serving).
    wire_mb = float(np.prod(staged.payload[0].shape)) / 1e6
    probe = float(np.median(probes))
    upload_ms = wire_mb / probe * 1e3
    comp_p50 = float(np.percentile(comp_ms, 50))
    result["wire_bound_model"] = {
        "upload_mb_per_img": round(wire_mb, 3),
        "probe_mb_per_sec_median": round(probe, 1),
        "predicted_upload_ms": round(upload_ms, 1),
        "compute_p50_ms": round(comp_p50, 1),
        "predicted_closed_loop_ms": round(upload_ms + comp_p50, 1),
        "measured_closed_loop_p50_ms": round(
            float(np.percentile(lat_ms, 50)), 1),
        "predicted_streamed_ms_per_img": round(max(upload_ms, comp_p50), 1),
        "measured_streamed_ms_per_img": round(stream_ms_per_img, 1),
    }
    result["note"] = (
        "single v5e chip via remote tunnel; closed-loop latency includes "
        "the per-request host->device upload (1.57 MB I420), so it tracks "
        "tunnel weather — compute_only is the serving stack's own "
        "latency, and streamed_batch1 shows the pipelined overlap "
        "(upload of k+1 under compute of k)")
    print(json.dumps(result))
    out = os.path.join(repo, "SERVE_BENCH.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
