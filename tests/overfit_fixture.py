"""Shared test fixture: a tiny CenterNet overfit on synthetic blob
images. Trained weights give confident, well-separated detections, so
eval-parity assertions (sharded vs single, fused vs unfused TTA) can be
near-exact instead of tolerating near-tied top-k noise.

Cached per process: several test modules reuse the same 40-step run.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from rrnet_tpu import config as cfglib


def blob_batch(b=8, n=4, hw=64, seed=11):
    """Images with bright axis-aligned rectangles on dark noise,
    annotated as objects — a tiny model overfits these in a few dozen
    steps."""
    rng = np.random.RandomState(seed)
    images = rng.rand(b, hw, hw, 3).astype(np.float32) * 0.1
    annos = np.zeros((b, n, 8), np.float32)
    for i in range(b):
        for j in range(n):
            w, h = rng.randint(8, 20, 2)
            x = rng.randint(0, hw - w)
            y = rng.randint(0, hw - h)
            images[i, y:y + h, x:x + w] = rng.rand(3) * 0.6 + 0.4
            annos[i, j] = [x, y, w, h, 1, rng.randint(1, 11), 0, 0]
    valid = np.ones((b, n), bool)
    return images, annos, valid


@functools.lru_cache(maxsize=2)
def overfit_tiny_centernet(steps=40):
    """Returns (variables, images_uint8_list) for a tiny CenterNet
    overfit on blob_batch()."""
    from rrnet_tpu.train import Trainer

    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
    cfg = cfglib.set_by_path(cfg, "train.crop_size", (64, 64))
    cfg = cfglib.set_by_path(cfg, "train.max_objects", 8)
    trainer = Trainer(cfg)
    state = trainer.init_state()
    images, annos, valid = blob_batch()
    mean = np.asarray(cfg.train.mean, np.float32)
    std = np.asarray(cfg.train.std, np.float32)
    batch = trainer.shard({
        "images": jnp.asarray((images - mean) / std),
        "annos": jnp.asarray(annos), "valid": jnp.asarray(valid)})
    for _ in range(steps):
        state, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["total"]))
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    imgs = [(im * 255).clip(0, 255).astype(np.uint8) for im in images]
    return variables, imgs
