"""Synthetic VisDrone dataset generator (rrnet_tpu/data/synth.py): the
fixture behind the train->eval->AP regression gate (scripts/synth_gate.py)
must be deterministic and loader-compatible."""

import hashlib
import os

import numpy as np

from rrnet_tpu.data.synth import make_synth_dataset
from rrnet_tpu.data.visdrone import VisDroneDataset


def _digest(d):
    h = hashlib.sha256()
    for root, _, files in sorted(os.walk(d)):
        for f in sorted(files):
            h.update(f.encode())
            with open(os.path.join(root, f), "rb") as fh:
                h.update(fh.read())
    return h.hexdigest()


def test_generator_deterministic_and_loadable(tmp_path):
    a = make_synth_dataset(str(tmp_path / "a"), n_train=3, n_val=2)
    b = make_synth_dataset(str(tmp_path / "b"), n_train=3, n_val=2)
    assert _digest(a) == _digest(b)

    train = VisDroneDataset(a, split="train", with_road_map=True)
    assert len(train) == 3
    s = train[0]
    img, annos, rm = s["image"], s["annos"], s["roadmap"]
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.shape[:2] == rm.shape
    # fill_duck needs road pixels to paste onto
    assert (rm > 0).mean() > 0.05
    # annotations: inside the image, positive size, valid classes
    assert len(annos) > 20
    assert (annos[:, 2] > 0).all() and (annos[:, 3] > 0).all()
    assert (annos[:, 0] >= 0).all() and (annos[:, 1] >= 0).all()
    assert (annos[:, 0] + annos[:, 2] <= img.shape[1] + 1).all()
    assert (annos[:, 1] + annos[:, 3] <= img.shape[0] + 1).all()
    assert set(np.unique(annos[:, 5].astype(int))) <= set(range(11))

    val = VisDroneDataset(a, split="val")
    assert len(val) == 2
    assert len(val[0]["annos"]) > 20
    # val images differ from train images (different seed stream)
    assert not np.array_equal(val[0]["image"], train[0]["image"])


def test_generator_images_differ(tmp_path):
    d = make_synth_dataset(str(tmp_path / "d"), n_train=4, n_val=1)
    ds = VisDroneDataset(d, split="train")
    imgs = [ds[i]["image"] for i in range(4)]
    assert not np.array_equal(imgs[0], imgs[2])  # same size bucket, diff rng
