"""DCNv2 tests mirroring the reference extension's own test protocol
(ext/dcn/test.py): zero-offset identity vs plain conv, plus finite-
difference gradient checks on input, weight, offset and mask."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rrnet_tpu.ops.dcn import deform_conv2d, deform_psroi_pooling


def plain_conv(x, w, stride=1, padding=1, dilation=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_zero_offset_equals_plain_conv():
    """With zero offsets and all-ones mask, DCN == standard conv
    (ext/dcn/test.py:32-67 zero-offset identity)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    off = jnp.zeros((2, 8, 8, 2 * 9), jnp.float32)
    msk = jnp.ones((2, 8, 8, 9), jnp.float32)
    out = deform_conv2d(x, w, off, msk, stride=1, padding=1)
    ref = plain_conv(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_zero_offset_stride_dilation():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 13, 11, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32))
    for stride, dil in [(2, 1), (1, 2), (2, 2)]:
        pad = dil
        ho = (13 + 2 * pad - (dil * 2 + 1)) // stride + 1
        wo = (11 + 2 * pad - (dil * 2 + 1)) // stride + 1
        off = jnp.zeros((1, ho, wo, 18), jnp.float32)
        msk = jnp.ones((1, ho, wo, 9), jnp.float32)
        out = deform_conv2d(x, w, off, msk, stride=stride, padding=pad,
                            dilation=dil)
        ref = plain_conv(x, w, stride, pad, dil)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_integer_offset_shifts_sampling():
    """An integer x-offset of +1 on every tap equals convolving the
    x-shifted image."""
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    w = rng.randn(3, 3, 2, 4).astype(np.float32)
    off = np.zeros((1, 8, 8, 18), np.float32)
    off[..., 9:] = 1.0   # x-offsets are the second half
    msk = np.ones((1, 8, 8, 9), np.float32)
    out = deform_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(off),
                        jnp.asarray(msk))
    shifted = np.zeros_like(x)
    shifted[:, :, :-1] = x[:, :, 1:]
    ref = plain_conv(jnp.asarray(shifted), jnp.asarray(w))
    # interior columns match exactly; the first column differs (conv
    # zero-padding vs DCN sampling the real pixel) and the right edge
    # differs by the shift's zero fill
    np.testing.assert_allclose(np.asarray(out)[:, :, 1:-2],
                               np.asarray(ref)[:, :, 1:-2], atol=1e-4)


def test_mask_scales_contribution():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
    off = jnp.zeros((1, 6, 6, 18), jnp.float32)
    half = jnp.full((1, 6, 6, 9), 0.5, jnp.float32)
    out_half = deform_conv2d(x, w, off, half)
    out_full = deform_conv2d(x, w, off, jnp.ones((1, 6, 6, 9)))
    np.testing.assert_allclose(np.asarray(out_half),
                               np.asarray(out_full) * 0.5, atol=1e-5)


def test_gradcheck_finite_difference():
    """Finite-difference gradcheck on all four inputs (the reference runs
    torch.autograd.gradcheck, ext/dcn/test.py:69+). Needs f64."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        _gradcheck_body()
    finally:
        jax.config.update("jax_enable_x64", old)


def _gradcheck_body():
    rng = np.random.RandomState(4)
    x = rng.randn(1, 5, 5, 2).astype(np.float64)
    w = rng.randn(3, 3, 2, 3).astype(np.float64)
    off = rng.randn(1, 5, 5, 18).astype(np.float64) * 0.3
    msk = rng.rand(1, 5, 5, 9).astype(np.float64)

    def f(x, w, off, msk):
        return jnp.sum(jnp.sin(deform_conv2d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(off),
            jnp.asarray(msk))))

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(x, w, off, msk)
    eps = 1e-5
    for ai, arr in enumerate((x, w, off, msk)):
        flat = arr.ravel()
        for j in rng.choice(flat.size, size=6, replace=False):
            bump = arr.copy().ravel()
            bump[j] += eps
            up = float(f(*[bump.reshape(arr.shape) if i == ai else a
                           for i, a in enumerate((x, w, off, msk))]))
            bump[j] -= 2 * eps
            dn = float(f(*[bump.reshape(arr.shape) if i == ai else a
                           for i, a in enumerate((x, w, off, msk))]))
            fd = (up - dn) / (2 * eps)
            an = float(np.asarray(grads[ai]).ravel()[j])
            assert abs(fd - an) < 1e-3 * max(1.0, abs(fd)), (ai, j, fd, an)


def test_deformable_groups_layout():
    """g=2: each channel half follows its own group's offsets."""
    rng = np.random.RandomState(5)
    x = rng.randn(1, 6, 6, 4).astype(np.float32)
    w = np.zeros((3, 3, 4, 4), np.float32)
    # identity-ish: center tap passes channel c -> c
    for c in range(4):
        w[1, 1, c, c] = 1.0
    off = np.zeros((1, 6, 6, 2 * 2 * 9), np.float32)
    # group 1 (channels 2,3): x-offset +1 on all taps.
    # layout: [g0 y(9) | g1 y(9) | g0 x(9) | g1 x(9)]
    off[..., 18 + 9:] = 1.0
    msk = np.ones((1, 6, 6, 18), np.float32)
    out = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(off), jnp.asarray(msk),
        deformable_groups=2))
    # channels 0,1 unshifted
    np.testing.assert_allclose(out[0, :, :, :2], x[0, :, :, :2], atol=1e-5)
    # channels 2,3 shifted left by one (sampling x+1)
    np.testing.assert_allclose(out[0, :, :-1, 2:], x[0, :, 1:, 2:], atol=1e-5)


def test_psroi_pooling_uniform_feature():
    """On a constant feature map, pooling returns the constant."""
    feat = jnp.full((16, 16, 8), 3.0)
    rois = jnp.asarray([[0, 2, 2, 10, 10]], jnp.float32)
    out = deform_psroi_pooling(feat, rois, None, spatial_scale=1.0,
                               pooled_size=3, output_dim=8, no_trans=True)
    assert out.shape == (1, 3, 3, 8)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


def test_psroi_trans_shifts():
    """A positive x-trans moves the sampled window right."""
    feat = np.zeros((16, 16, 4), np.float32)
    feat[:, 8:, :] = 1.0    # right half ones
    rois = jnp.asarray([[0, 0, 0, 7, 15]], jnp.float32)
    base = deform_psroi_pooling(jnp.asarray(feat), rois, None,
                                pooled_size=2, output_dim=4, no_trans=True)
    trans = jnp.ones((1, 2, 2, 2), jnp.float32)
    shifted = deform_psroi_pooling(jnp.asarray(feat), rois, trans,
                                   pooled_size=2, output_dim=4,
                                   trans_std=0.5, no_trans=False)
    assert float(shifted.mean()) > float(base.mean())


def test_dcn_pooling_module_init_is_half_base():
    """DCNPooling module (ext/dcn/dcn_v2.py:223-303): the offset-FC
    trunk's final layer is zero-init, so at init offsets are 0 and the
    mask is sigmoid(0)=0.5 -> output == 0.5 * plain PSROI pooling."""
    import jax
    from rrnet_tpu.models.modules import DCNPooling

    rng = np.random.RandomState(0)
    feat = rng.randn(2, 12, 16, 8).astype(np.float32)
    rois = np.array([[0, 2, 2, 9, 7],
                     [1, 0, 0, 15, 11],
                     [0, 4, 1, 6, 3]], np.float32)

    mod = DCNPooling(spatial_scale=1.0, pooled_size=3, output_dim=8,
                     no_trans=False)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(feat),
                         jnp.asarray(rois))
    out = mod.apply(variables, jnp.asarray(feat), jnp.asarray(rois))

    base_mod = DCNPooling(spatial_scale=1.0, pooled_size=3, output_dim=8,
                          no_trans=True)
    base = base_mod.apply({"params": {}}, jnp.asarray(feat),
                          jnp.asarray(rois))
    assert out.shape == (3, 3, 3, 8)
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(base),
                               atol=1e-5)


def test_dcn_pooling_module_batch_routing_and_grad():
    """ROIs route to their own image's features; gradients flow through
    the trunk (the reference's pooling gradcheck, ext/dcn/test.py)."""
    import jax
    from rrnet_tpu.models.modules import DCNPooling

    rng = np.random.RandomState(1)
    feat = rng.randn(2, 8, 8, 4).astype(np.float32)
    # identical ROI boxes, different images -> different outputs
    rois = np.array([[0, 1, 1, 6, 6], [1, 1, 1, 6, 6]], np.float32)
    mod = DCNPooling(spatial_scale=1.0, pooled_size=2, output_dim=4,
                     no_trans=True)
    out = mod.apply({"params": {}}, jnp.asarray(feat), jnp.asarray(rois))
    assert np.abs(np.asarray(out[0]) - np.asarray(out[1])).max() > 1e-3

    mod2 = DCNPooling(spatial_scale=1.0, pooled_size=2, output_dim=4,
                      no_trans=False, trans_std=0.1)
    variables = mod2.init(jax.random.PRNGKey(0), jnp.asarray(feat),
                          jnp.asarray(rois))

    def loss(v, f):
        return (mod2.apply(v, f, jnp.asarray(rois)) ** 2).sum()

    g_v, g_f = jax.grad(loss, argnums=(0, 1))(variables, jnp.asarray(feat))
    # fc1/fc2 receive gradient (fc3 zero-init blocks first-order fc3
    # *input* grads but its own weights get gradient via the mask)
    g3 = np.asarray(g_v["params"]["fc3"]["kernel"])
    assert np.isfinite(np.asarray(g_f)).all()
    assert np.abs(g3).max() > 0
