"""Pallas soft-NMS kernel vs the oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from rrnet_tpu.ops.pallas_nms import soft_nms_pallas
from tests.oracles import np_soft_nms
from tests.test_nms import random_dets


def run_pallas(boxes, scores, **kw):
    return soft_nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                           interpret=True, **kw)


def test_matches_oracle_gaussian():
    boxes, scores = random_dets(100, seed=0)
    new_scores, keep, rank = run_pallas(
        boxes, scores, sigma=0.5, iou_threshold=0.7,
        score_threshold=0.1, method="gaussian")
    order, oracle = np_soft_nms(boxes, scores, sigma=0.5, iou_threshold=0.7,
                                score_threshold=0.1, method="gaussian")
    keep = np.asarray(keep)
    assert set(np.where(keep)[0]) == set(order)
    np.testing.assert_allclose(np.asarray(new_scores)[keep],
                               oracle[keep], rtol=1e-4, atol=1e-5)
    rank = np.asarray(rank)
    got_order = np.where(keep)[0][np.argsort(rank[keep])]
    np.testing.assert_array_equal(got_order, order)


def test_matches_oracle_linear_hard():
    for method in ("linear", "hard"):
        boxes, scores = random_dets(64, seed=3)
        ns, keep, _ = run_pallas(boxes, scores, sigma=0.5,
                                 iou_threshold=0.3, score_threshold=0.05,
                                 method=method)
        order, oracle = np_soft_nms(boxes, scores, sigma=0.5,
                                    iou_threshold=0.3, score_threshold=0.05,
                                    method=method)
        keep = np.asarray(keep)
        assert set(np.where(keep)[0]) == set(order), method


def test_valid_mask_and_padding():
    boxes, scores = random_dets(70, seed=5)   # pads to 128
    valid = np.ones(70, bool)
    valid[50:] = False
    ns, keep, _ = run_pallas(boxes, scores, valid=jnp.asarray(valid),
                             sigma=0.5, iou_threshold=0.7,
                             score_threshold=0.1)
    keep = np.asarray(keep)
    assert not keep[50:].any()
    order, _ = np_soft_nms(boxes[:50], scores[:50], sigma=0.5,
                           iou_threshold=0.7, score_threshold=0.1)
    assert set(np.where(keep[:50])[0]) == set(order)


def test_per_class_matches_split():
    boxes, scores = random_dets(60, seed=7)
    cls = np.random.RandomState(7).randint(0, 3, 60)
    ns, keep, _ = run_pallas(boxes, scores,
                             class_ids=jnp.asarray(cls),
                             sigma=0.5, iou_threshold=0.3,
                             score_threshold=0.05)
    keep = np.asarray(keep)
    for c in range(3):
        sel = cls == c
        order, _ = np_soft_nms(boxes[sel], scores[sel], sigma=0.5,
                               iou_threshold=0.3, score_threshold=0.05)
        assert set(np.where(keep[sel])[0]) == set(order), c


def test_max_out_truncates():
    boxes, scores = random_dets(40, seed=9, span=1000)  # mostly disjoint
    ns, keep, rank = run_pallas(boxes, scores, sigma=0.5,
                                iou_threshold=0.7, score_threshold=0.1,
                                max_out=10)
    assert np.asarray(keep).sum() <= 10
