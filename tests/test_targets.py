import numpy as np
import jax.numpy as jnp

from rrnet_tpu.ops import targets
from tests.oracles import np_gaussian_radius, np_render_targets


def test_gaussian_radius_matches_oracle():
    rng = np.random.RandomState(0)
    hs = rng.rand(50) * 60 + 1
    ws = rng.rand(50) * 60 + 1
    got = np.asarray(targets.gaussian_radius(jnp.asarray(hs), jnp.asarray(ws)))
    for i in range(50):
        np.testing.assert_allclose(got[i], np_gaussian_radius(hs[i], ws[i]),
                                   rtol=1e-5)


def _random_annos(n, img_hw=(64, 64), seed=0, num_classes=10):
    rng = np.random.RandomState(seed)
    h, w = img_hw
    xy = rng.rand(n, 2) * np.array([w - 20, h - 20])
    wh = rng.rand(n, 2) * 18 + 2
    cls = rng.randint(1, num_classes + 1, (n, 1)).astype(np.float64)
    pad = np.ones((n, 1))
    return np.concatenate([xy, wh, pad, cls, pad, pad], -1).astype(np.float32)


def test_render_targets_matches_oracle():
    annos = _random_annos(12, seed=3)
    valid = np.ones(12, bool)
    valid[-2:] = False
    feat = (16, 16)

    out = targets.render_centernet_targets(
        jnp.asarray(annos), jnp.asarray(valid), feat_shape=feat,
        scale_factor=4, num_classes=10, chunk=4)
    hm_o, wh_o, ind_o, off_o, mask_o = np_render_targets(
        annos, valid, feat, scale_factor=4, num_classes=10)

    np.testing.assert_allclose(np.asarray(out.hm), hm_o, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.wh), wh_o, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.ind), ind_o)
    np.testing.assert_allclose(np.asarray(out.offset), off_o, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.reg_mask), mask_o)


def test_render_targets_peak_is_one():
    annos = _random_annos(5, seed=1)
    out = targets.render_centernet_targets(
        jnp.asarray(annos), jnp.ones(5, bool), feat_shape=(16, 16),
        scale_factor=4, num_classes=10)
    hm = np.asarray(out.hm)
    # every valid object's center pixel must be exactly 1
    for i in range(5):
        ind = int(np.asarray(out.ind)[i])
        cls = int(annos[i, 5]) - 1
        y, x = divmod(ind, 16)
        np.testing.assert_allclose(hm[y, x, cls], 1.0, atol=1e-6)


def test_render_targets_zero_size_masked():
    annos = _random_annos(3, seed=2)
    annos[1, 2:4] = 0.0   # zero-size box
    out = targets.render_centernet_targets(
        jnp.asarray(annos), jnp.ones(3, bool), feat_shape=(16, 16),
        scale_factor=4, num_classes=10)
    assert np.asarray(out.reg_mask)[1] == 0.0


def test_render_batch_shapes():
    annos = np.stack([_random_annos(8, seed=s) for s in range(3)])
    valid = np.ones((3, 8), bool)
    out = targets.render_batch(jnp.asarray(annos), jnp.asarray(valid),
                               feat_shape=(32, 32), scale_factor=4,
                               num_classes=10)
    assert out.hm.shape == (3, 32, 32, 10)
    assert out.wh.shape == (3, 8, 2)
    assert out.ind.shape == (3, 8)


def test_class_agnostic_heatmap():
    annos = _random_annos(6, seed=4)
    out = targets.render_centernet_targets(
        jnp.asarray(annos), jnp.ones(6, bool), feat_shape=(16, 16),
        scale_factor=4, num_classes=10, class_agnostic=True)
    assert out.hm.shape == (16, 16, 1)
    assert float(np.asarray(out.hm).max()) == 1.0
