import numpy as np
import jax.numpy as jnp

from rrnet_tpu.ops import nms
from tests.oracles import np_hard_nms, np_soft_nms


def random_dets(n, seed=0, span=100.0):
    rng = np.random.RandomState(seed)
    xy = rng.rand(n, 2) * span
    wh = rng.rand(n, 2) * span * 0.3 + 1.0
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


def test_hard_nms_matches_oracle():
    for seed in range(4):
        boxes, scores = random_dets(64, seed)
        keep = np.asarray(
            nms.hard_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
        )
        expected = np_hard_nms(boxes, scores, 0.5)
        got = np.where(keep)[0]
        assert set(got) == set(expected), (sorted(got), sorted(expected))


def test_fixpoint_equals_sequential():
    """The fixpoint iteration must reproduce the literal greedy scan,
    including on dense overlapping chains (drone-crowd-like data)."""
    for seed in range(6):
        rng = np.random.RandomState(seed)
        n = 128
        # chains: boxes drift so A-B overlap, B-C overlap, A-C don't
        xy = np.cumsum(rng.rand(n, 2) * 6, axis=0) % 80
        wh = rng.rand(n, 2) * 12 + 6
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        for thr in (0.2, 0.5):
            fix = np.asarray(nms.hard_nms(
                jnp.asarray(boxes), jnp.asarray(scores), thr,
                method="fixpoint"))
            seq = np.asarray(nms.hard_nms(
                jnp.asarray(boxes), jnp.asarray(scores), thr,
                method="sequential"))
            np.testing.assert_array_equal(fix, seq)


def test_hard_nms_legacy_mode():
    boxes, scores = random_dets(48, seed=7)
    keep = np.asarray(
        nms.hard_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.4,
                     plus_one=True, suppress_equal=True)
    )
    expected = np_hard_nms(boxes, scores, 0.4, plus_one=True, suppress_equal=True)
    assert set(np.where(keep)[0]) == set(expected)


def test_hard_nms_respects_valid_mask():
    boxes, scores = random_dets(32, seed=3)
    valid = np.ones(32, bool)
    valid[10:] = False
    keep = np.asarray(
        nms.hard_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                     valid=jnp.asarray(valid))
    )
    assert not keep[10:].any()
    expected = np_hard_nms(boxes[:10], scores[:10], 0.5)
    assert set(np.where(keep[:10])[0]) == set(expected)


def test_soft_nms_matches_oracle():
    for method in ("gaussian", "linear", "hard"):
        boxes, scores = random_dets(40, seed=11)
        new_scores, keep, rank = nms.soft_nms(
            jnp.asarray(boxes), jnp.asarray(scores),
            sigma=0.5, iou_threshold=0.3, score_threshold=0.05,
            method=method,
        )
        order, oracle_scores = np_soft_nms(
            boxes, scores, sigma=0.5, iou_threshold=0.3,
            score_threshold=0.05, method=method,
        )
        keep = np.asarray(keep)
        got = np.where(keep)[0]
        assert set(got) == set(order), method
        # decayed scores match for kept boxes
        np.testing.assert_allclose(
            np.asarray(new_scores)[keep], oracle_scores[keep],
            rtol=1e-5, atol=1e-6,
        )
        # selection order matches
        rank = np.asarray(rank)
        got_order = got[np.argsort(rank[got])]
        np.testing.assert_array_equal(got_order, order)


def test_soft_nms_reference_params():
    """Nt=0.7 / threshold=0.1 / gaussian — the parameters every reference
    call site uses (ext/nms usage)."""
    boxes, scores = random_dets(64, seed=21)
    new_scores, keep, _ = nms.soft_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        sigma=0.5, iou_threshold=0.7, score_threshold=0.1, method="gaussian",
    )
    order, oracle_scores = np_soft_nms(
        boxes, scores, sigma=0.5, iou_threshold=0.7, score_threshold=0.1,
        method="gaussian",
    )
    keep = np.asarray(keep)
    assert set(np.where(keep)[0]) == set(order)


def test_per_class_soft_nms_equals_split():
    """Soft-NMS with class_ids must equal running each class separately."""
    boxes, scores = random_dets(60, seed=5)
    cls = np.random.RandomState(5).randint(0, 3, 60)
    new_scores, keep, _ = nms.soft_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        class_ids=jnp.asarray(cls),
        sigma=0.5, iou_threshold=0.3, score_threshold=0.05,
    )
    keep = np.asarray(keep)
    new_scores = np.asarray(new_scores)
    for c in range(3):
        sel = cls == c
        order, oracle_scores = np_soft_nms(
            boxes[sel], scores[sel], sigma=0.5, iou_threshold=0.3,
            score_threshold=0.05,
        )
        idx = np.where(sel)[0]
        assert set(np.where(keep[sel])[0]) == set(order)
        np.testing.assert_allclose(
            new_scores[idx][keep[sel]], oracle_scores[keep[sel]],
            rtol=1e-5, atol=1e-6,
        )


def test_batched_nms_no_cross_class_suppression():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=np.float32)
    scores = np.array([0.9, 0.8], dtype=np.float32)
    cls = np.array([0, 1])
    keep = np.asarray(nms.batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls), 0.5
    ))
    assert keep.all()


def test_topk_after_nms():
    boxes, scores = random_dets(32, seed=9)
    keep = nms.hard_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    bk, sk, vk, idx = nms.topk_after_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                         keep, 8)
    vk = np.asarray(vk)
    n_kept = int(np.asarray(keep).sum())
    assert vk.sum() == min(8, n_kept)
    # valid entries are kept boxes sorted by score desc
    sk = np.asarray(sk)
    assert (np.diff(sk[vk]) <= 1e-6).all()
