"""Data pipeline tests on the VisDrone demo fixture (data/demo/)."""

import os

import numpy as np
import pytest

from rrnet_tpu import config as cfglib
from rrnet_tpu.data import transforms as T
from rrnet_tpu.data.loader import TrainLoader, pad_annotations
from rrnet_tpu.data.visdrone import VisDroneDataset, parse_annotation_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "data", "demo")


@pytest.fixture(scope="module")
def demo_sample():
    ds = VisDroneDataset(DEMO, split="", with_road_map=True)
    assert len(ds) == 1
    return ds[0]


def test_parse_annotations(demo_sample):
    annos = demo_sample["annos"]
    assert annos.shape[1] == 8
    assert len(annos) > 0
    assert (annos[:, 5] != 11).all()
    # boxes inside image
    h, w = demo_sample["image"].shape[:2]
    assert (annos[:, 0] + annos[:, 2] <= w + 1).all()


def test_multi_scale_scales_boxes(demo_sample):
    rng = np.random.default_rng(0)
    out = T.multi_scale(demo_sample, rng, scales=(1.5,))
    h0, w0 = demo_sample["image"].shape[:2]
    assert out["image"].shape[0] == int(h0 * 1.5)
    np.testing.assert_allclose(out["annos"][:, :4],
                               demo_sample["annos"][:, :4] * 1.5)


def test_mask_ignore_removes_cls0(demo_sample):
    out = T.mask_ignore(demo_sample)
    assert (out["annos"][:, 5] != 0).all()


def test_horizontal_flip_roundtrip(demo_sample):
    rng = np.random.default_rng(0)
    out = T.horizontal_flip(demo_sample, rng, p=1.1)  # always flip
    out2 = T.horizontal_flip(out, rng, p=1.1)
    np.testing.assert_allclose(out2["annos"][:, :4],
                               demo_sample["annos"][:, :4], atol=1e-4)
    np.testing.assert_allclose(out2["image"], demo_sample["image"])


def test_random_crop_shapes_and_boxes(demo_sample):
    rng = np.random.default_rng(1)
    out = T.random_crop(demo_sample, rng, size=(512, 512))
    assert out["image"].shape == (512, 512, 3)
    a = out["annos"]
    if len(a):
        assert (a[:, 0] >= 0).all() and (a[:, 1] >= 0).all()
        assert (a[:, 0] + a[:, 2] <= 512 + 1e-3).all()


def test_fill_duck_adds_annotations(demo_sample):
    rng = np.random.default_rng(2)
    sample = T.mask_ignore(demo_sample)
    # ensure a roadmap exists: mark lower half road
    h, w = sample["image"].shape[:2]
    rm = np.zeros((h, w), np.float32)
    rm[h // 2:, :] = 1.0
    sample = dict(sample, roadmap=rm)
    out = T.fill_duck(sample, rng)
    assert len(out["annos"]) >= len(sample["annos"])


def test_full_train_pipeline_deterministic(demo_sample):
    cfg = cfglib.rrnet_config()
    a = T.train_pipeline(dict(demo_sample), np.random.default_rng(7), cfg)
    b = T.train_pipeline(dict(demo_sample), np.random.default_rng(7), cfg)
    np.testing.assert_allclose(a["image"], b["image"])
    np.testing.assert_allclose(a["annos"], b["annos"])
    assert a["image"].shape == (512, 512, 3)


def test_pad_annotations():
    annos = np.ones((5, 8), np.float32)
    annos[:, 2] = np.arange(5) + 1   # areas differ
    out, valid = pad_annotations(annos, 3)
    assert out.shape == (3, 8)
    assert valid.sum() == 3
    # keeps the largest-area boxes
    assert set(out[:, 2]) == {3, 4, 5}
    out2, valid2 = pad_annotations(np.zeros((0, 8)), 4)
    assert valid2.sum() == 0


def test_train_loader_batches():
    cfg = cfglib.rrnet_config()
    cfg = cfglib.set_by_path(cfg, "data_root", DEMO)
    cfg = cfglib.set_by_path(cfg, "train.max_objects", 64)
    # opt-in packed YUV420 wire rows (train default is full-precision rgb)
    cfg = cfglib.set_by_path(cfg, "train.transport", "yuv420")
    ds = VisDroneDataset(DEMO, split="", with_road_map=True)
    loader = TrainLoader(cfg, batch_size=2, dataset=ds, num_threads=2)
    try:
        batch = loader.get_batch()
        assert batch["images"].shape == (2, 512 * 512 * 3 // 2)
        assert batch["images"].dtype == np.uint8
        assert batch["annos"].shape == (2, 64, 8)
        assert batch["valid"].shape == (2, 64)
        assert batch["valid"].any()
        assert np.isfinite(batch["images"]).all()
    finally:
        loader.close()
