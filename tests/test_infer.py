"""Evaluator (multi-scale bucketed inference) tests on CPU."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rrnet_tpu import config as cfglib
from rrnet_tpu.evallib.infer import Evaluator, _flip_valid_width, _round_up
from rrnet_tpu.models import build_model

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_flip_valid_width():
    img = np.arange(12, dtype=np.float32).reshape(1, 1, 12, 1)
    out = np.asarray(_flip_valid_width(jnp.asarray(img),
                                       jnp.asarray([8])))
    np.testing.assert_array_equal(out[0, 0, :8, 0], np.arange(8)[::-1])
    np.testing.assert_array_equal(out[0, 0, 8:, 0], np.arange(8, 12))


@pytest.fixture(scope="module")
def tiny_eval():
    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
    cfg = cfglib.set_by_path(cfg, "val.scales", (1.0, 1.25))
    cfg = cfglib.set_by_path(cfg, "val.flip_tta", True)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    ev = Evaluator(cfg, variables, model=model, bucket_multiple=64,
                   decode_topk=50)
    return cfg, ev


def test_predict_shapes_and_bounds(tiny_eval):
    cfg, ev = tiny_eval
    rng = np.random.RandomState(0)
    img = (rng.rand(100, 150, 3) * 255).astype(np.uint8)
    pred = ev.predict(img)
    assert pred.shape[1] == 6
    assert len(pred) > 0
    # detections must lie inside the original image extent (+tolerance)
    assert (pred[:, 0] + pred[:, 2] <= 150 + 8).all()
    assert (pred[:, 1] + pred[:, 3] <= 100 + 8).all()
    assert (pred[:, 5] >= 1).all() and (pred[:, 5] <= 10).all()
    # sorted by score desc
    assert (np.diff(pred[:, 4]) <= 1e-9).all()


def test_bucket_reuse(tiny_eval):
    """Same-bucket images must not trigger new compiles."""
    cfg, ev = tiny_eval
    rng = np.random.RandomState(1)
    ev.predict((rng.rand(100, 150, 3) * 255).astype(np.uint8))
    n = len(ev._compiled)
    ev.predict((rng.rand(90, 140, 3) * 255).astype(np.uint8))  # same bucket
    assert len(ev._compiled) == n
    ev.predict((rng.rand(200, 150, 3) * 255).astype(np.uint8))  # new bucket
    assert len(ev._compiled) > n


def test_padding_emits_no_detections():
    """An image much smaller than its bucket: all detections must stay
    within the valid extent (padding masked out of the heatmap)."""
    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
    cfg = cfglib.set_by_path(cfg, "val.scales", (1.0,))
    cfg = cfglib.set_by_path(cfg, "val.flip_tta", False)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    ev = Evaluator(cfg, variables, model=model, bucket_multiple=256,
                   decode_topk=100)
    img = np.full((65, 70, 3), 128, np.uint8)   # bucket 256x256
    pred = ev.predict(img)
    centers_x = pred[:, 0] + pred[:, 2] / 2
    centers_y = pred[:, 1] + pred[:, 3] / 2
    assert (centers_x <= 70 + 4).all(), centers_x.max()
    assert (centers_y <= 65 + 4).all(), centers_y.max()


def test_scale_resize_no_pad_bleed(tiny_eval):
    """r4 verdict: padding to the bucket BEFORE the per-scale bilinear
    resize bled the pad band (-mean/std) ~1 px into the valid content at
    scales > 1, diverging from the reference protocol (which resizes the
    tight image, operators/rrnet_operator.py:260). With edge-replicate
    padding, a constant-color image must stay exactly constant across
    the whole scaled valid extent — any bleed shows up as a deviation at
    the boundary pixels."""
    cfg, ev = tiny_eval
    color = np.array([120, 180, 60], np.uint8)
    img = np.broadcast_to(color, (100, 150, 3)).copy()
    staged = ev._upload([img])
    payload, bucket, hws, tight = staged
    scaled = ev._scaled_shape(bucket, 1.25)
    pre = ev._build_preprocess(bucket, scaled, flip=False, tight=tight)
    x, vhw = jax.jit(pre)(payload, jnp.asarray(hws, jnp.int32))
    x = np.asarray(x)
    vh, vw = int(vhw[0, 0]), int(vhw[0, 1])
    region = x[0, :vh, :vw]
    # spatial constancy (transport-agnostic: yuv420 shifts the constant
    # value uniformly, so compare against the region's own center pixel)
    center = region[vh // 2, vw // 2]
    np.testing.assert_allclose(region, np.broadcast_to(center,
                                                       region.shape),
                               rtol=0, atol=1e-5)


def test_host_staging_edge_pad(tiny_eval):
    """Batch staging pads each image to the batch-tight shape with edge
    replication (not zeros) for the same reason."""
    cfg, _ = tiny_eval
    cfg = cfglib.set_by_path(cfg, "val.transport", "rgb")
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    ev = Evaluator(cfg, variables, model=model, bucket_multiple=64,
                   decode_topk=50)
    rng = np.random.RandomState(7)
    big = (rng.rand(100, 150, 3) * 255).astype(np.uint8)
    small = (rng.rand(80, 120, 3) * 255).astype(np.uint8)
    payload, bucket, hws, tight = ev._upload([big, small])
    th, tw = tight
    assert ev.transport == "rgb"
    flat = np.concatenate([np.asarray(p) for p in payload], axis=0)
    stack = flat.reshape(2, th, tw, 3)
    # rows below the small image replicate its last valid row
    np.testing.assert_array_equal(stack[1, 80:, :120],
                                  np.broadcast_to(small[79], (th - 80, 120, 3)))
    # columns right of the small image replicate its last valid column
    np.testing.assert_array_equal(
        stack[1, :80, 120:],
        np.broadcast_to(small[:, 119][:, None], (80, tw - 120, 3)))


def test_round_up():
    assert _round_up(1, 128) == 128
    assert _round_up(128, 128) == 128
    assert _round_up(129, 128) == 256


def test_mesh_sharded_eval_matches_single_device():
    """Evaluator(mesh=...) shards eval batches over the data axis
    (replacing the reference's single-GPU eval loop,
    operators/rrnet_operator.py:246-284). An 8-image batch on the
    8-device mesh must produce the same detections as the unsharded
    evaluator."""
    from jax.sharding import Mesh

    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
    cfg = cfglib.set_by_path(cfg, "model.dtype", "float32")
    cfg = cfglib.set_by_path(cfg, "val.scales", (1.0,))
    cfg = cfglib.set_by_path(cfg, "val.flip_tta", False)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    kw = dict(model=model, bucket_multiple=64, decode_topk=50)
    ev_single = Evaluator(cfg, variables, **kw)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    ev_mesh = Evaluator(cfg, variables, mesh=mesh, **kw)

    rng = np.random.RandomState(7)
    imgs = [(rng.rand(96, 120, 3) * 255).astype(np.uint8)
            for _ in range(8)]
    ref = ev_single.predict_batch(imgs)
    got = ev_mesh.predict_batch(imgs)
    assert len(ref) == len(got) == 8
    for r, g in zip(ref, got):
        assert r.shape == g.shape
        # Per-device batch is 1 vs 8, so XLA may pick different conv
        # reduction orders; tiny drift can swap ranks of near-tied
        # detections from the random-weight heatmap. Compare the
        # score-sorted score vectors exactly-ish, and require every
        # ref detection to have a near-identical match in got.
        np.testing.assert_allclose(
            np.sort(g[:, 4])[::-1], np.sort(r[:, 4])[::-1], atol=1e-4)
        for row in r:
            d = np.abs(g - row[None]).max(axis=1)
            assert d.min() < 1e-2, (row, d.min())


@pytest.mark.slow
def test_fused_flip_matches_unfused():
    """fuse_flip=True (one 2B forward per scale) must produce the same
    confident detections as the two separate flip programs. Overfit
    weights make top-k membership stable; only bf16-ulp deltas remain
    (a 2B batch tiles convs differently than a B batch)."""
    from overfit_fixture import overfit_tiny_centernet

    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
    cfg = cfglib.set_by_path(cfg, "val.scales", (1.0, 1.25))
    cfg = cfglib.set_by_path(cfg, "val.flip_tta", True)
    variables, imgs = overfit_tiny_centernet()
    imgs = imgs[:3]
    model = build_model(cfg)
    fused_ev = Evaluator(cfg, variables, model=model, bucket_multiple=64,
                         decode_topk=20, fuse_flip=True)
    unfused_ev = Evaluator(cfg, variables, model=model, bucket_multiple=64,
                           decode_topk=20, fuse_flip=False)
    fused = fused_ev.predict_batch(imgs)
    unfused = unfused_ev.predict_batch(imgs)
    assert len(fused) == len(unfused) == 3
    for a, b in zip(fused, unfused):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.sort(a[:, 4]), np.sort(b[:, 4]),
                                   atol=5e-3)
        conf_a = a[a[:, 4] >= 0.15]
        conf_b = b[b[:, 4] >= 0.15]
        assert len(conf_a) == len(conf_b) >= 4
        used = np.zeros(len(conf_b), bool)
        for row in conf_a:
            d = np.abs(conf_b - row[None]).max(axis=1)
            d[used] = np.inf
            j = int(d.argmin())
            assert d[j] < 0.5, (row, conf_b)
            used[j] = True


def test_stage2_zero_delta_mode():
    """stage2_decode='zero' must equal the stage-1 ROIs grown by the
    reference's +1 extent (x, y unchanged; w, h + 1)."""
    import jax.numpy as jnp
    from rrnet_tpu.ops.box import decode_boxes

    rois_xywh = jnp.asarray([[10.0, 20.0, 30.0, 40.0],
                             [0.0, 0.0, 5.0, 7.0]])
    dec = decode_boxes(rois_xywh, jnp.zeros_like(rois_xywh))
    np.testing.assert_allclose(
        np.asarray(dec),
        np.asarray([[10.0, 20.0, 31.0, 41.0], [0.0, 0.0, 6.0, 8.0]]),
        rtol=1e-6)


def test_evaluator_stage2_decode_validation():
    from rrnet_tpu import config as cfglib
    from rrnet_tpu.evallib.infer import Evaluator
    cfg = cfglib.rrnet_config()
    with pytest.raises(ValueError):
        Evaluator(cfg, variables=None, model=object(),
                  stage2_decode="bogus")
