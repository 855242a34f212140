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


def test_evaluate_split_with_mesh_pads_leftovers(tmp_path):
    """The scripts/eval.py --data-parallel path: evaluate_split on a
    mesh-backed Evaluator must handle a leftover batch (5 images,
    batch_size 8 on an 8-device mesh) by padding to the batch size so
    every shard is non-empty, and still write one txt per image."""
    from jax.sharding import Mesh

    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
    cfg = cfglib.set_by_path(cfg, "val.scales", (1.0,))
    cfg = cfglib.set_by_path(cfg, "val.flip_tta", False)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    ev = Evaluator(cfg, variables, model=model, bucket_multiple=64,
                   decode_topk=20, mesh=mesh)
    loader = FakeLoader([(60, 70)] * 5)
    out = ev.evaluate_split(loader, result_dir=str(tmp_path), batch_size=8,
                            verbose=False)
    assert sorted(os.listdir(out)) == [f"img{i:03d}.txt" for i in range(5)]


def test_mesh_sharded_eval_matches_single():
    """Evaluator(mesh=...): batches shard over the data axis of an
    8-device mesh and produce the same detections as unsharded eval.
    Uses overfit weights (VERDICT r2 #8) so the per-row assertion is
    near-exact: with trained weights top-k membership is stable."""
    import jax
    from jax.sharding import Mesh

    from overfit_fixture import overfit_tiny_centernet

    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
    cfg = cfglib.set_by_path(cfg, "val.scales", (1.0,))
    cfg = cfglib.set_by_path(cfg, "val.flip_tta", False)
    variables, imgs = overfit_tiny_centernet()
    model = build_model(cfg)

    plain = Evaluator(cfg, variables, model=model, bucket_multiple=64,
                      decode_topk=20)
    base = plain.predict_batch(imgs)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1),
                ("data", "model"))
    sharded = Evaluator(cfg, variables, model=model, bucket_multiple=64,
                        decode_topk=20, mesh=mesh)
    out = sharded.predict_batch(imgs)

    assert len(base) == len(out) == 8
    for a, b in zip(base, out):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.sort(a[:, 4]), np.sort(b[:, 4]),
                                   atol=5e-3)
        # Every trained-in detection (the overfit blobs, score >= 0.15)
        # must have a 1:1 counterpart within bf16-ulp noise (<= 0.2 px /
        # 5e-3 score). Only the near-tied noise floor (score ~0.07) may
        # legitimately permute under sharded reduction layouts.
        conf_a = a[a[:, 4] >= 0.15]
        conf_b = b[b[:, 4] >= 0.15]
        assert len(conf_a) == len(conf_b) >= 4
        used = np.zeros(len(conf_b), bool)
        for row in conf_a:
            d = np.abs(conf_b - row[None]).max(axis=1)
            d[used] = np.inf
            j = int(d.argmin())
            assert d[j] < 0.2, (row, conf_b)
            used[j] = True
