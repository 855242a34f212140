"""evaluate_split pipeline: bucket grouping, batch padding, 3-stage pump
ordering — every image must get exactly one result file."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from rrnet_tpu import config as cfglib
from rrnet_tpu.evallib.infer import Evaluator
from rrnet_tpu.models import build_model
import pytest

pytestmark = pytest.mark.slow


class FakeLoader:
    def __init__(self, sizes):
        rng = np.random.RandomState(0)
        self.items = [
            {"name": f"img{i:03d}",
             "image": (rng.rand(h, w, 3) * 255).astype(np.uint8),
             "annos": np.zeros((0, 8))}
            for i, (h, w) in enumerate(sizes)
        ]

    def __iter__(self):
        return iter(self.items)


def test_evaluate_split_all_images_written(tmp_path):
    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
    cfg = cfglib.set_by_path(cfg, "val.scales", (1.0,))
    cfg = cfglib.set_by_path(cfg, "val.flip_tta", False)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    ev = Evaluator(cfg, variables, model=model, bucket_multiple=64,
                   decode_topk=20)

    # 2 buckets: 5 images of 60x70 (batch 2 -> 2 full + 1 leftover) and
    # 3 images of 100x120 (1 full + 1 leftover)
    sizes = [(60, 70)] * 5 + [(100, 120)] * 3
    loader = FakeLoader(sizes)
    out = ev.evaluate_split(loader, result_dir=str(tmp_path), batch_size=2,
                            verbose=False)
    files = sorted(os.listdir(out))
    assert files == [f"img{i:03d}.txt" for i in range(8)]
    # each file parses as VisDrone rows
    from rrnet_tpu.evallib.writer import load_result
    for f in files:
        rows = load_result(os.path.join(out, f))
        assert rows.shape[1] >= 6


def test_evaluate_split_respects_max_images(tmp_path):
    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
    cfg = cfglib.set_by_path(cfg, "val.scales", (1.0,))
    cfg = cfglib.set_by_path(cfg, "val.flip_tta", False)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    ev = Evaluator(cfg, variables, model=model, bucket_multiple=64,
                   decode_topk=20)
    loader = FakeLoader([(60, 70)] * 6)
    out = ev.evaluate_split(loader, result_dir=str(tmp_path), batch_size=4,
                            max_images=3, verbose=False)
    assert len(os.listdir(out)) == 3
