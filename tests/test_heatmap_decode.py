import numpy as np
import jax.numpy as jnp
import jax

from rrnet_tpu.ops import heatmap


def logit(p):
    return np.log(p / (1 - p))


def test_peak_nms_keeps_local_maxima():
    hm = np.zeros((1, 8, 8, 1), np.float32)
    hm[0, 3, 3, 0] = 0.9
    hm[0, 3, 4, 0] = 0.5   # neighbor of the peak -> suppressed
    hm[0, 7, 0, 0] = 0.4   # isolated corner -> kept
    out = np.asarray(heatmap.peak_nms(jnp.asarray(hm)))
    assert out[0, 3, 3, 0] == np.float32(0.9)
    assert out[0, 3, 4, 0] == 0.0
    assert out[0, 7, 0, 0] == np.float32(0.4)


def test_topk_decode_basic():
    b, h, w, c = 1, 16, 16, 3
    hm = np.full((b, h, w, c), logit(0.01), np.float32)
    # one strong detection: class 1 at (y=4, x=5), wh=(6,4), offset (.25,.5)
    hm[0, 4, 5, 1] = logit(0.9)
    wh = np.zeros((b, h, w, 2), np.float32)
    wh[0, 4, 5] = (6.0, 4.0)
    off = np.zeros((b, h, w, 2), np.float32)
    off[0, 4, 5] = (0.25, 0.5)

    dets = heatmap.topk_decode(jnp.asarray(hm), jnp.asarray(wh),
                               jnp.asarray(off), k=5, scale_factor=4.0)
    boxes = np.asarray(dets.boxes)
    scores = np.asarray(dets.scores)
    classes = np.asarray(dets.classes)

    np.testing.assert_allclose(scores[0, 0], 0.9, atol=1e-5)
    assert classes[0, 0] == 1
    cx, cy = (5 + 0.25), (4 + 0.5)
    expected = np.array([cx - 3, cy - 2, cx + 3, cy + 2]) * 4.0
    np.testing.assert_allclose(boxes[0, 0], expected, atol=1e-4)


def test_topk_decode_matches_per_class_then_global_topk():
    """Global top-k over (H*W*C) must equal the reference's per-class-k
    then global-k cascade."""
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 12, 12, 4
    hm = rng.randn(b, h, w, c).astype(np.float32)
    wh = np.abs(rng.randn(b, h, w, 2)).astype(np.float32)
    off = rng.rand(b, h, w, 2).astype(np.float32)
    k = 20

    dets = heatmap.topk_decode(jnp.asarray(hm), jnp.asarray(wh),
                               jnp.asarray(off), k=k)
    probs = 1 / (1 + np.exp(-hm))
    for bi in range(b):
        # oracle: per-class top-k then global top-k of those
        per_cls = np.sort(probs[bi].reshape(-1, c), axis=0)[::-1][:k]  # (k, c)
        expected = np.sort(per_cls.flatten())[::-1][:k]
        np.testing.assert_allclose(np.sort(np.asarray(dets.scores)[bi])[::-1],
                                   expected, atol=1e-6)


def test_topk_decode_no_offset_adds_half():
    b, h, w, c = 1, 8, 8, 1
    hm = np.full((b, h, w, c), logit(0.01), np.float32)
    hm[0, 2, 3, 0] = logit(0.8)
    wh = np.zeros((b, h, w, 2), np.float32)
    wh[0, 2, 3] = (2.0, 2.0)
    dets = heatmap.topk_decode(jnp.asarray(hm), jnp.asarray(wh), None, k=1)
    np.testing.assert_allclose(np.asarray(dets.xs)[0, 0], 3.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dets.ys)[0, 0], 2.5, atol=1e-6)


def test_wh_clamped_nonnegative():
    b, h, w, c = 1, 8, 8, 1
    hm = np.full((b, h, w, c), logit(0.5), np.float32)
    wh = np.full((b, h, w, 2), -3.0, np.float32)
    dets = heatmap.topk_decode(jnp.asarray(hm), jnp.asarray(wh), None, k=4)
    boxes = np.asarray(dets.boxes)
    np.testing.assert_allclose(boxes[..., 2] - boxes[..., 0], 0.0, atol=1e-6)


def test_gather_map_at():
    rng = np.random.RandomState(1)
    fm = rng.randn(2, 4, 5, 3).astype(np.float32)
    ind = np.array([[0, 7], [19, 3]])
    out = np.asarray(heatmap.gather_map_at(jnp.asarray(fm), jnp.asarray(ind)))
    flat = fm.reshape(2, 20, 3)
    for bi in range(2):
        for ni in range(2):
            np.testing.assert_allclose(out[bi, ni], flat[bi, ind[bi, ni]])
