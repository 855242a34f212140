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


# ---------------------------------------------------------------------------
# class-parallel kernel (soft_nms_pallas_classes)
# ---------------------------------------------------------------------------

def run_classes(boxes, scores, cls, num_classes, **kw):
    from rrnet_tpu.ops.pallas_nms import soft_nms_pallas_classes
    return soft_nms_pallas_classes(
        jnp.asarray(boxes), jnp.asarray(scores),
        class_ids=jnp.asarray(cls), num_classes=num_classes,
        interpret=True, **kw)


def _serial_reference(boxes, scores, cls, **kw):
    """The already-oracle-tested serial kernel, per_class=True."""
    return soft_nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                           class_ids=jnp.asarray(cls), per_class=True,
                           interpret=True, **kw)


def test_classes_matches_serial_per_class():
    """Same keep set, kept scores and kept selection order as the serial
    per-class kernel (itself oracle-exact)."""
    boxes, scores = random_dets(200, seed=11)
    cls = np.random.RandomState(11).randint(0, 10, 200)
    kw = dict(sigma=0.5, iou_threshold=0.7, score_threshold=0.1,
              method="gaussian")
    ns_c, keep_c, rank_c = run_classes(boxes, scores, cls, 10, **kw)
    ns_s, keep_s, rank_s = _serial_reference(boxes, scores, cls, **kw)
    keep_c, keep_s = np.asarray(keep_c), np.asarray(keep_s)
    np.testing.assert_array_equal(keep_c, keep_s)
    # with no max_out both kernels run every class to exhaustion, so
    # the FULL score vector (incl. decayed non-kept boxes) must match
    np.testing.assert_allclose(np.asarray(ns_c), np.asarray(ns_s),
                               rtol=1e-5, atol=1e-6)
    # selection order: the class-parallel global rank is reconstructed
    # from final scores; must equal the serial selection order
    oc = np.where(keep_c)[0][np.argsort(np.asarray(rank_c)[keep_c])]
    os_ = np.where(keep_s)[0][np.argsort(np.asarray(rank_s)[keep_s])]
    np.testing.assert_array_equal(oc, os_)


def test_classes_matches_oracle_per_class_split():
    boxes, scores = random_dets(120, seed=13)
    cls = np.random.RandomState(13).randint(0, 4, 120)
    ns, keep, _ = run_classes(boxes, scores, cls, 4, sigma=0.5,
                              iou_threshold=0.3, score_threshold=0.05)
    keep = np.asarray(keep)
    for c in range(4):
        sel = cls == c
        order, oracle = np_soft_nms(boxes[sel], scores[sel], sigma=0.5,
                                    iou_threshold=0.3, score_threshold=0.05)
        assert set(np.where(keep[sel])[0]) == set(order), c
        np.testing.assert_allclose(np.asarray(ns)[sel][keep[sel]],
                                   oracle[keep[sel]], rtol=1e-4, atol=1e-5)


def test_classes_methods_and_valid():
    boxes, scores = random_dets(90, seed=17)
    cls = np.random.RandomState(17).randint(0, 3, 90)
    valid = np.ones(90, bool)
    valid[70:] = False
    for method in ("linear", "hard", "gaussian"):
        kw = dict(sigma=0.5, iou_threshold=0.3, score_threshold=0.05,
                  method=method)
        ns_c, keep_c, _ = run_classes(boxes, scores, cls, 3,
                                      valid=jnp.asarray(valid), **kw)
        ns_s, keep_s, _ = _serial_reference(boxes, scores, cls,
                                            valid=jnp.asarray(valid), **kw)
        keep_c = np.asarray(keep_c)
        np.testing.assert_array_equal(keep_c, np.asarray(keep_s), method)
        assert not keep_c[70:].any()


def test_classes_max_out_prefix():
    """max_out truncation must keep the same prefix the serial loop
    (which stops decaying at max_out) selects."""
    boxes, scores = random_dets(150, seed=19)
    cls = np.random.RandomState(19).randint(0, 5, 150)
    kw = dict(sigma=0.5, iou_threshold=0.5, score_threshold=0.08,
              method="gaussian", max_out=20)
    ns_c, keep_c, rank_c = run_classes(boxes, scores, cls, 5, **kw)
    ns_s, keep_s, rank_s = _serial_reference(boxes, scores, cls, **kw)
    keep_c, keep_s = np.asarray(keep_c), np.asarray(keep_s)
    assert keep_c.sum() <= 20
    np.testing.assert_array_equal(keep_c, keep_s)
    np.testing.assert_allclose(np.asarray(ns_c)[keep_c],
                               np.asarray(ns_s)[keep_s], rtol=1e-5,
                               atol=1e-6)


def test_classes_single_class_degenerate():
    """All boxes one class: degenerates to plain sequential soft-NMS."""
    boxes, scores = random_dets(80, seed=23)
    cls = np.zeros(80, np.int32)
    ns, keep, rank = run_classes(boxes, scores, cls, 10, sigma=0.5,
                                 iou_threshold=0.7, score_threshold=0.1)
    order, oracle = np_soft_nms(boxes, scores, sigma=0.5, iou_threshold=0.7,
                                score_threshold=0.1)
    keep = np.asarray(keep)
    assert set(np.where(keep)[0]) == set(order)
    got_order = np.where(keep)[0][np.argsort(np.asarray(rank)[keep])]
    np.testing.assert_array_equal(got_order, order)
