"""Serving surface tests: Predictor warmup/compile behavior and
MicroBatcher grouping semantics (CPU)."""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rrnet_tpu import config as cfglib
from rrnet_tpu.models import build_model
from rrnet_tpu.serving import MicroBatcher, Predictor

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def predictor():
    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
    # the preset's eval protocol is multi-scale + flip TTA; Predictor
    # must force the deployment setting regardless
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    pred = Predictor(cfg, variables, model=model,
                     image_shapes=((100, 150),),
                     bucket_multiple=64, decode_topk=50)
    return pred


def _img(rng, h=100, w=150):
    return (rng.rand(h, w, 3) * 255).astype(np.uint8)


def test_deployment_setting_forced(predictor):
    assert predictor.cfg.val.scales == (1.0,)
    assert predictor.cfg.val.flip_tta is False


def test_warmup_precompiles(predictor):
    n = predictor.warmup()
    assert predictor.warmed_up and n >= 1
    # a real request at the warmed shape must not compile a new program
    rng = np.random.RandomState(0)
    predictor.predict(_img(rng))
    assert len(predictor._ev._compiled) == n
    # nor one at a smaller same-bucket shape (sticky wire shape)
    predictor.predict(_img(rng, 90, 140))
    assert len(predictor._ev._compiled) == n


def test_predict_matches_evaluator(predictor):
    rng = np.random.RandomState(1)
    img = _img(rng)
    a = predictor.predict(img)
    b = predictor._ev.predict(img)
    np.testing.assert_array_equal(a, b)
    stats = predictor.latency_stats()
    assert stats["count"] >= 2 and stats["p50_s"] > 0


def test_microbatcher_results_match_individual(predictor):
    """Identical submitted images must yield identical detections (the
    batched program is deterministic), and a burst must actually batch.
    (Cross-batch-size numeric equality is NOT asserted: different batch
    programs may order score ties differently through top-k + NMS.)"""
    rng = np.random.RandomState(2)
    img = _img(rng)
    with MicroBatcher(predictor, max_batch=4, max_delay_ms=50.0) as mb:
        futs = [mb.submit(img) for _ in range(6)]
        outs = [f.result(timeout=120) for f in futs]
    for got in outs[1:]:
        if got.shape == outs[0].shape:
            np.testing.assert_allclose(got, outs[0], atol=2e-3)
    # under a burst, at least one real batch must have formed
    assert max(mb.batch_sizes) > 1
    assert sum(mb.batch_sizes) == 6


def test_microbatcher_routes_results_to_their_requests(predictor):
    """Two same-bucket images with very different valid extents, batched
    together: each future's detections must respect ITS image's extent
    (padding is masked on device), proving results aren't swapped."""
    rng = np.random.RandomState(5)
    big = _img(rng, 120, 190)
    small = _img(rng, 70, 130)    # same 128x192 bucket, small extent
    assert predictor.bucket_of(big) == predictor.bucket_of(small)
    with MicroBatcher(predictor, max_batch=4, max_delay_ms=100.0) as mb:
        f_big = mb.submit(big)
        f_small = mb.submit(small)
        p_big, p_small = f_big.result(timeout=120), f_small.result(timeout=120)
    assert mb.batch_sizes[-1] == 2
    assert (p_small[:, 0] + p_small[:, 2] <= 130 + 8).all()
    assert (p_small[:, 1] + p_small[:, 3] <= 70 + 8).all()
    # with an untrained model the big image should produce detections
    # beyond the small extent — if routing swapped, the check above
    # would have tripped
    assert ((p_big[:, 0] + p_big[:, 2] > 138) |
            (p_big[:, 1] + p_big[:, 3] > 78)).any()


def test_microbatcher_groups_by_bucket(predictor):
    rng = np.random.RandomState(3)
    small = [_img(rng, 60, 60) for _ in range(2)]   # 64x64 bucket
    big = [_img(rng, 100, 150) for _ in range(2)]   # 128x192 bucket
    with MicroBatcher(predictor, max_batch=8, max_delay_ms=100.0) as mb:
        futs = [mb.submit(im) for im in small + big]
        outs = [f.result(timeout=120) for f in futs]
    assert all(o.shape[1] == 6 for o in outs)
    # 4 requests in one delay window -> exactly 2 per-bucket groups
    assert sorted(mb.batch_sizes[-2:]) == [2, 2]


def test_microbatcher_close_rejects_and_drains(predictor):
    rng = np.random.RandomState(4)
    mb = MicroBatcher(predictor, max_batch=2, max_delay_ms=1.0)
    fut = mb.submit(_img(rng))
    mb.close()
    assert fut.result(timeout=120).shape[1] == 6
    with pytest.raises(RuntimeError):
        mb.submit(_img(rng))


def test_update_variables_drops_programs(predictor):
    predictor.warmup()
    predictor.update_variables(predictor._ev.variables)
    assert not predictor.warmed_up
    assert len(predictor._ev._compiled) == 0
    predictor.warmup()


def test_microbatcher_surfaces_errors_and_survives(predictor):
    """A malformed request must fail ITS OWN future with the original
    exception (promptly — not via a Future timeout), must not kill the
    worker thread, and later good requests must still resolve."""
    rng = np.random.RandomState(6)
    with MicroBatcher(predictor, max_batch=2, max_delay_ms=1.0) as mb:
        fut = mb.submit("not an image")
        with pytest.raises(Exception) as ei:
            fut.result(timeout=10)   # short: surfacing must be immediate
        assert not isinstance(ei.value, TimeoutError)
        assert mb._worker.is_alive()
        # the worker must still serve traffic after the bad request
        good = mb.submit(_img(rng))
        assert good.result(timeout=120).shape[1] == 6


def test_microbatcher_cancelled_future_does_not_abort_drain(predictor):
    """A caller-cancelled future must not crash the worker or strand
    other queued requests (resolution is guarded by
    set_running_or_notify_cancel)."""
    rng = np.random.RandomState(7)
    with MicroBatcher(predictor, max_batch=4, max_delay_ms=50.0) as mb:
        f1 = mb.submit(_img(rng))
        f1.cancel()
        f2 = mb.submit(_img(rng))
        assert f2.result(timeout=120).shape[1] == 6
        assert mb._worker.is_alive()
    assert f1.cancelled() or f1.done()


def test_microbatcher_pipelined_stream_matches_sequential(predictor):
    """Open-loop streaming at batch 1 with pipeline_depth=2 (upload of
    k+1 overlaps compute of k) must produce exactly the detections the
    direct predict path produces, in request order."""
    rng = np.random.RandomState(8)
    imgs = [_img(rng) for _ in range(5)]
    want = [predictor.predict(im) for im in imgs]
    with MicroBatcher(predictor, max_batch=1, max_delay_ms=0.0,
                      pipeline_depth=2) as mb:
        futs = [mb.submit(im) for im in imgs]
        got = [f.result(timeout=120) for f in futs]
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)
    assert mb.batch_sizes == [1] * 5


def test_quantized_warmup_requires_calibration(predictor):
    """Predictor(quantize='int8').warmup() before calibrate() would bake
    all-zero activation scales via the Evaluator's lazy calibration; it
    must raise instead."""
    pred8 = Predictor(predictor.cfg, predictor._ev.variables,
                      model=predictor._ev.model,
                      image_shapes=((100, 150),),
                      bucket_multiple=64, decode_topk=50,
                      quantize="int8")
    with pytest.raises(RuntimeError, match="calibrat"):
        pred8.warmup()
