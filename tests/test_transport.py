"""YUV420 image transport: round-trip fidelity + eval equivalence.

The eval pipeline can ship images host->device as JPEG-native YUV 4:2:0
planes (half the bytes of RGB). VisDrone JPEGs are 4:2:0, so half-res
chroma is all the source files carry; the device reconstructs RGB with
bilinear chroma upsampling (rrnet_tpu/evallib/infer.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rrnet_tpu import config as cfglib
from rrnet_tpu.evallib.infer import Evaluator
from rrnet_tpu.data.yuv420 import (
    rgb_to_yuv420, yuv420_to_rgb_device as _yuv420_to_rgb_device)
from rrnet_tpu.models import build_model


def _smooth_image(rng, h, w):
    """Natural-image stand-in: low-frequency content upsampled 8x."""
    small = rng.rand(h // 8, w // 8, 3)
    img = np.asarray(jax.image.resize(jnp.asarray(small), (h, w, 3),
                                      method="bilinear"))
    return (img * 255).astype(np.uint8)


def test_yuv420_roundtrip_gray():
    """Gray (chroma-free) content must round-trip to within luma
    quantization (+-1)."""
    img = np.full((2, 64, 64, 3), 77, np.uint8)
    y, uv = rgb_to_yuv420(img)
    assert y.shape == (2, 64, 64) and uv.shape == (2, 32, 32, 2)
    rec = np.asarray(_yuv420_to_rgb_device(jnp.asarray(y), jnp.asarray(uv)))
    assert np.abs(rec - 77.0).max() <= 1.0


def test_yuv420_roundtrip_natural():
    """Smooth natural-like content: small mean error, bounded max."""
    rng = np.random.RandomState(0)
    img = _smooth_image(rng, 128, 128)[None]
    y, uv = rgb_to_yuv420(img)
    rec = np.asarray(_yuv420_to_rgb_device(jnp.asarray(y), jnp.asarray(uv)))
    err = np.abs(rec - img.astype(np.float32))
    assert err.mean() < 2.5, err.mean()
    assert err.max() < 40, err.max()   # isolated chroma-edge pixels


def test_yuv420_bytes_halved():
    img = np.zeros((4, 128, 256, 3), np.uint8)
    y, uv = rgb_to_yuv420(img)
    assert y.nbytes + uv.nbytes == img.nbytes // 2


def test_yuv420_roundtrip_demo_jpeg():
    """Fidelity on a real VisDrone image (the 4:2:0 demo JPEG): the
    round trip through the transport must stay within ~1 gray level on
    average — i.e. well under the JPEG's own quantization noise."""
    import os
    from rrnet_tpu.data.visdrone import VisDroneDataset
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds = VisDroneDataset(os.path.join(repo, "data", "demo"), split="")
    img = ds.load_image(ds.names[0])
    h, w = (img.shape[0] // 2) * 2, (img.shape[1] // 2) * 2
    img = img[None, :h, :w]
    y, uv = rgb_to_yuv420(img)
    rec = np.asarray(_yuv420_to_rgb_device(jnp.asarray(y), jnp.asarray(uv)))
    err = np.abs(rec - img.astype(np.float32))
    assert err.mean() < 1.5, err.mean()
    assert np.percentile(err, 99) < 10, np.percentile(err, 99)


@pytest.mark.slow
def test_transport_equivalence_eval():
    """rgb and yuv420 transports must run the full Evaluator path and
    produce validly structured detections from the same image; their
    score mass must be close (the input tensors differ only by chroma
    smoothing, but an untrained model's noise peaks may reorder)."""
    rng = np.random.RandomState(3)
    img = _smooth_image(rng, 96, 144)

    preds = {}
    for transport in ("rgb", "yuv420"):
        cfg = cfglib.centernet_config()
        cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
        cfg = cfglib.set_by_path(cfg, "val.scales", (1.0,))
        cfg = cfglib.set_by_path(cfg, "val.flip_tta", False)
        cfg = cfglib.set_by_path(cfg, "val.transport", transport)
        model = build_model(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False)
        ev = Evaluator(cfg, variables, model=model, bucket_multiple=64,
                       decode_topk=50)
        preds[transport] = ev.predict(img)

    a, b = preds["rgb"], preds["yuv420"]
    assert len(a) > 0 and len(b) > 0
    assert a.shape[1] == 6 and b.shape[1] == 6
    # aggregate score mass within 5% — same image, same weights
    assert abs(a[:, 4].sum() - b[:, 4].sum()) / max(a[:, 4].sum(), 1e-9) < 0.05


def test_pack_unpack_yuv420_roundtrip():
    """Packed train-wire rows -> device unpack must equal the plane
    converter composed by hand."""
    from rrnet_tpu.data.yuv420 import (
        pack_yuv420, unpack_yuv420_device, yuv420_to_rgb_host)
    rng = np.random.RandomState(1)
    img = _smooth_image(rng, 64, 96)[None].repeat(2, axis=0)
    flat = pack_yuv420(img)
    assert flat.shape == (2, 64 * 96 * 3 // 2) and flat.dtype == np.uint8
    rec = np.asarray(unpack_yuv420_device(jnp.asarray(flat), 64, 96))
    err = np.abs(rec - img.astype(np.float32))
    assert err.mean() < 2.5, err.mean()
    # host mirror of the device inverse matches to rounding
    # (wire rows are planar I420: Y plane, U plane, V plane)
    q = 64 * 96 // 4
    y = flat[:, :64 * 96].reshape(2, 64, 96)
    uv = np.stack([flat[:, 64 * 96:64 * 96 + q].reshape(2, 32, 48),
                   flat[:, 64 * 96 + q:].reshape(2, 32, 48)], axis=-1)
    host = yuv420_to_rgb_host(y, uv)
    assert np.abs(host.astype(np.float32) - rec).max() <= 1.0


@pytest.mark.slow
def test_train_transport_yuv420_step():
    """TrainLoader(transport='yuv420') must emit packed rows and the
    train step must consume them, producing a loss close to the rgb
    transport's on the same underlying samples (chroma smoothing only)."""
    import os
    from rrnet_tpu.data.loader import TrainLoader
    from rrnet_tpu.train import Trainer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    losses = {}
    for transport in ("rgb", "yuv420"):
        cfg = cfglib.centernet_config()
        for k, v in {
            "data_root": os.path.join(repo, "data", "demo"),
            "model.backbone": "tiny_hourglass",
            "train.batch_size": 2,
            "train.crop_size": (128, 128),
            "train.max_objects": 64,
            "train.fill_duck": False,
            "train.transport": transport,
        }.items():
            cfg = cfglib.set_by_path(cfg, k, v)
        from rrnet_tpu.parallel.mesh import create_mesh
        mesh = create_mesh(cfg.mesh, devices=jax.devices()[:1])
        loader = TrainLoader(cfg, 2, num_threads=1)
        trainer = Trainer(cfg, mesh=mesh)
        state = trainer.init_state()
        batch = loader.get_batch()
        if transport == "yuv420":
            assert batch["images"].ndim == 2
            assert batch["images"].shape[1] == 128 * 128 * 3 // 2
        else:
            assert batch["images"].shape[1:] == (128, 128, 3)
        _, metrics = trainer.train_step(state, trainer.shard(batch))
        losses[transport] = float(metrics["total"])
        loader.close()
    assert np.isfinite(losses["rgb"]) and np.isfinite(losses["yuv420"])
    assert abs(losses["rgb"] - losses["yuv420"]) / losses["rgb"] < 0.05, losses
