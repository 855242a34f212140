import numpy as np

from rrnet_tpu.evallib import host_nms
from tests.oracles import np_soft_nms, np_hard_nms
from tests.test_nms import random_dets


def test_native_lib_builds():
    assert host_nms._load() is not None, "native host_nms failed to build"


def test_native_soft_nms_matches_oracle():
    boxes, scores = random_dets(80, seed=2)
    dets = np.concatenate([boxes, scores[:, None]], -1)
    kept = host_nms.soft_nms(dets, sigma=0.5, Nt=0.7, threshold=0.1,
                             method="gaussian")
    order, oracle_scores = np_soft_nms(boxes, scores, sigma=0.5,
                                       iou_threshold=0.7,
                                       score_threshold=0.1,
                                       method="gaussian")
    assert len(kept) == len(order)
    np.testing.assert_array_equal(kept[:, :4], boxes[order])
    np.testing.assert_allclose(kept[:, 4], oracle_scores[order], rtol=1e-5)


def test_native_vs_numpy_fallback():
    boxes, scores = random_dets(50, seed=9)
    dets = np.concatenate([boxes, scores[:, None]], -1)
    native = host_nms.soft_nms(dets.copy(), sigma=0.5, Nt=0.3,
                               threshold=0.02, method="linear")
    fallback = host_nms._soft_nms_numpy(dets.astype(np.float32), 0.5, 0.3,
                                        0.02, 1)
    np.testing.assert_allclose(native[:, :5], fallback[:, :5], rtol=1e-5)


def test_native_hard_nms():
    boxes, scores = random_dets(64, seed=4)
    dets = np.concatenate([boxes, scores[:, None]], -1)
    keep = host_nms.hard_nms_indices(dets, 0.5)
    expected = np_hard_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(np.sort(keep), np.sort(expected))


def test_per_class_soft_nms_xywh_roundtrip():
    rng = np.random.RandomState(0)
    n = 30
    pred = np.concatenate([
        rng.rand(n, 2) * 50, rng.rand(n, 2) * 20 + 2,
        rng.rand(n, 1), rng.randint(1, 4, (n, 1)).astype(float)], -1)
    out = host_nms.per_class_soft_nms_xywh(pred, Nt=0.7, threshold=0.01)
    assert out.shape[1] == 6
    assert (out[:, 2] > 0).all() and (out[:, 3] > 0).all()
    # classes preserved
    assert set(np.unique(out[:, 5])) <= set(np.unique(pred[:, 5]))
