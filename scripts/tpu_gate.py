"""TPU training regression gate.

Runs a short real-chip training burst for each detector family at the
reference schedule's shapes (512^2 crops, batch 4 — configs/
rrnet_config.py:21-32) using synthetic-but-realistic batches, asserts
finite losses and records ms/step + img/s into TPU_GATE.json so
throughput regressions are caught round over round (the reference has
no such gate; round-1 numbers lived only in commit messages).

Usage: python scripts/tpu_gate.py [--steps 30] [--out TPU_GATE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_batch(rng: np.random.RandomState, batch: int, size: int,
                    max_objects: int):
    """VisDrone-like padded batch: uint8-ish images (normalized on host
    here — the gate measures the jitted step, not host preprocess) and
    (N, 8) annotation rows [x, y, w, h, score, cls, trunc, occ]."""
    images = rng.randn(batch, size, size, 3).astype(np.float32)
    n = max_objects
    xy = rng.rand(batch, n, 2) * (size - 48)
    wh = rng.rand(batch, n, 2) * 40 + 8
    annos = np.concatenate([
        xy, wh, np.ones((batch, n, 1)),
        rng.randint(1, 11, (batch, n, 1)).astype(np.float32),
        np.zeros((batch, n, 2))], -1).astype(np.float32)
    valid = np.zeros((batch, n), bool)
    valid[:, :n // 2] = True
    return {"images": images, "annos": annos, "valid": valid}


def run_family(name: str, steps: int, batch: int = None) -> dict:
    import jax

    from rrnet_tpu import config as cfglib
    from rrnet_tpu.parallel.mesh import create_mesh
    from rrnet_tpu.train import Trainer

    cfg = getattr(cfglib, f"{name}_config")()
    cfg = cfglib.set_by_path(cfg, "train.stage2_warmup_steps", 0) \
        if name == "rrnet" else cfg
    if batch is None:
        batch = max(int(cfg.train.batch_size), 4)
    cfg = cfglib.set_by_path(cfg, "train.batch_size", batch)
    size = 512
    max_objects = cfg.train.max_objects

    mesh = create_mesh(cfg.mesh, devices=jax.devices()[:1])
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state()

    rng = np.random.RandomState(0)
    batches = [trainer.shard(synthetic_batch(rng, batch, size, max_objects))
               for _ in range(4)]

    # compile + warmup
    state, metrics = trainer.train_step(state, batches[0])
    total = float(metrics["total"])
    assert np.isfinite(total), f"{name}: non-finite warmup loss"

    t0 = time.time()
    for i in range(steps):
        state, metrics = trainer.train_step(state, batches[i % len(batches)])
    total = float(metrics["total"])   # forces the chain
    elapsed = time.time() - t0
    assert np.isfinite(total), f"{name}: non-finite loss after {steps} steps"

    ms_per_step = elapsed / steps * 1000
    return {
        "family": name,
        "batch": batch,
        "crop": size,
        "steps": steps,
        "ms_per_step": round(ms_per_step, 1),
        "img_per_sec_per_chip": round(batch / (elapsed / steps), 1),
        "final_loss": round(total, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--out", default="TPU_GATE.json")
    ap.add_argument("--families", default="centernet,rrnet")
    args = ap.parse_args()

    import jax
    from rrnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    results = {"device": str(jax.devices()[0]), "families": []}
    for fam in args.families.split(","):
        # reference schedule batch (4/chip, configs/rrnet_config.py:22)
        # and the throughput-optimal batches: at 512^2 a batch of 8 runs
        # at nearly the same step latency as 4 on v5e (the small-batch
        # convs underutilize the MXU), so img/s roughly doubles.
        for batch in (None, 8, 16):
            r = run_family(fam.strip(), args.steps, batch=batch)
            results["families"].append(r)
            print(json.dumps(r))

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
