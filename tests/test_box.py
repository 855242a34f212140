import numpy as np
import jax.numpy as jnp

from rrnet_tpu.ops import box


def test_xywh_xyxy_roundtrip():
    rng = np.random.RandomState(0)
    b = rng.rand(17, 4).astype(np.float32) * 100
    out = box.xyxy_to_xywh(box.xywh_to_xyxy(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(out), b, atol=1e-5)


def test_pairwise_iou_manual():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0],
                   [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(box.pairwise_iou(a, b))
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 2], 0.0, atol=1e-6)


def test_pairwise_iou_overlap_mode():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 5.0, 10.0]])
    iou, overlap = box.pairwise_iou(a, b, return_overlap=True)
    np.testing.assert_allclose(np.asarray(iou)[0, 0], 0.5, atol=1e-6)
    # overlap = intersection / area(a)
    np.testing.assert_allclose(np.asarray(overlap)[0, 0], 0.5, atol=1e-6)


def test_encode_decode_consistency():
    """decode_boxes inverts encode_boxes given the +1/-interplay used by
    the reference (stage-2 head): encode uses xyxy+1 extents; decode takes
    xywh rois and bumps wh by +1."""
    rng = np.random.RandomState(1)
    xy = rng.rand(32, 2) * 100
    wh = rng.rand(32, 2) * 50 + 5
    rois_xyxy = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    gt = rois_xyxy + rng.randn(32, 4).astype(np.float32) * 3

    deltas = box.encode_boxes(jnp.asarray(rois_xyxy), jnp.asarray(gt))
    rois_xywh = box.xyxy_to_xywh(jnp.asarray(rois_xyxy))
    dec_xywh = box.decode_boxes(rois_xywh, deltas)
    dec_xyxy = np.asarray(box.xywh_to_xyxy(dec_xywh))

    # decode reconstructs the +1-convention box: x2' = x2+1 etc.
    np.testing.assert_allclose(dec_xyxy[:, :2], np.asarray(gt)[:, :2] - 0.0,
                               atol=1e-3)
    np.testing.assert_allclose(dec_xyxy[:, 2:], np.asarray(gt)[:, 2:] + 1.0,
                               atol=1e-3)


def test_giou_identical_boxes():
    b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    g = np.asarray(box.giou(b, b))
    np.testing.assert_allclose(g, 1.0, atol=1e-5)


def test_giou_disjoint_is_negative():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[10.0, 10.0, 11.0, 11.0]])
    assert float(box.giou(a, b)[0]) < 0
