"""Oracle tests for the fused Pallas DCNv2 forward (ops/pallas_dcn.py).

The oracle is ops/dcn.py::deform_conv2d, itself FD-gradchecked and
matching the CUDA sampler's zero-outside semantics
(ext/dcn/src/cuda/dcn_v2_im2col_cuda.cu:25-54). Interpret mode makes the
kernel runnable on the CPU test platform.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrnet_tpu.ops.dcn import deform_conv2d
from rrnet_tpu.ops.pallas_dcn import deform_conv2d_fused, deform_conv2d_pallas


def _make_case(b=2, h=8, w=8, cin=8, cout=8, k=3, g=2, seed=0,
               stride=1, padding=1, dilation=1, off_scale=2.5):
    rng = np.random.RandomState(seed)
    ho = (h + 2 * padding - (dilation * (k - 1) + 1)) // stride + 1
    wo = (w + 2 * padding - (dilation * (k - 1) + 1)) // stride + 1
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    wt = jnp.asarray(rng.randn(k, k, cin, cout) * 0.1, jnp.float32)
    # offsets large enough to push some samples fully out of bounds,
    # exercising the zero-outside tent semantics
    off = jnp.asarray(rng.randn(b, ho, wo, g * 2 * k * k) * off_scale,
                      jnp.float32)
    mask = jnp.asarray(rng.rand(b, ho, wo, g * k * k), jnp.float32)
    bias = jnp.asarray(rng.randn(cout), jnp.float32)
    return x, wt, off, mask, bias


@pytest.mark.parametrize("g", [1, 2])
@pytest.mark.parametrize("dilation", [1, 2])
def test_pallas_matches_xla_oracle(g, dilation):
    x, wt, off, mask, bias = _make_case(g=g, dilation=dilation,
                                        padding=dilation)
    ref = deform_conv2d(x, wt, off, mask, bias, padding=dilation,
                        dilation=dilation, deformable_groups=g)
    got = deform_conv2d_pallas(x, wt, off, mask, bias, padding=dilation,
                               dilation=dilation, deformable_groups=g,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_no_mask_no_bias():
    x, wt, off, _, _ = _make_case(g=2)
    ref = deform_conv2d(x, wt, off, None, None, deformable_groups=2)
    got = deform_conv2d_pallas(x, wt, off, None, None,
                               deformable_groups=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_stride2():
    x, wt, off, mask, bias = _make_case(stride=2)
    ref = deform_conv2d(x, wt, off, mask, bias, stride=2,
                        deformable_groups=2)
    got = deform_conv2d_pallas(x, wt, off, mask, bias, stride=2,
                               deformable_groups=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_grad_matches_xla_grad(monkeypatch):
    """custom-vjp wrapper: jax.grad THROUGH deform_conv2d_fused itself
    (Pallas forward in interpret mode for the CPU platform, XLA backward)
    must equal pure-XLA autodiff gradients for every argument."""
    from functools import partial

    from rrnet_tpu.ops import pallas_dcn

    orig = deform_conv2d_pallas
    monkeypatch.setattr(pallas_dcn, "deform_conv2d_pallas",
                        partial(orig, interpret=True))

    x, wt, off, mask, bias = _make_case(b=1, h=8, w=8, cin=4, cout=4, g=1)

    def loss_fused(x_, w_, o_, m_, b_):
        return jnp.sum(pallas_dcn.deform_conv2d_fused(x_, w_, o_, m_, b_) ** 2)

    def loss_ref(x_, w_, o_, m_, b_):
        return jnp.sum(deform_conv2d(x_, w_, o_, m_, b_) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, wt, off, mask, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, wt, off, mask, bias)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)

    # mask=None / bias=None: the VJP's cotangent structure must carry the
    # None slots through without error and still match XLA
    def loss_fused_nm(x_, w_, o_):
        return jnp.sum(pallas_dcn.deform_conv2d_fused(x_, w_, o_, None, None) ** 2)

    def loss_ref_nm(x_, w_, o_):
        return jnp.sum(deform_conv2d(x_, w_, o_, None, None) ** 2)

    g_fn = jax.grad(loss_fused_nm, argnums=(0, 1, 2))(x, wt, off)
    g_rn = jax.grad(loss_ref_nm, argnums=(0, 1, 2))(x, wt, off)
    for a, b in zip(g_fn, g_rn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("g", [1, 2])
@pytest.mark.parametrize("dilation", [1, 2])
def test_pallas_bwd_matches_xla_vjp(g, dilation):
    """Fused Pallas backward (transposed tent-matmul program) vs the XLA
    autodiff VJP through ops.dcn, for a fixed upstream cotangent."""
    from rrnet_tpu.ops.pallas_dcn import deform_conv2d_pallas_bwd

    x, wt, off, mask, bias = _make_case(cin=16, cout=16, g=g,
                                        dilation=dilation, padding=dilation)
    rng = np.random.RandomState(7)
    ct = jnp.asarray(rng.randn(*np.asarray(
        deform_conv2d(x, wt, off, mask, bias, padding=dilation,
                      dilation=dilation, deformable_groups=g)).shape),
        jnp.float32)

    def ref(x_, w_, o_, m_):
        return deform_conv2d(x_, w_, o_, m_, None, padding=dilation,
                             dilation=dilation, deformable_groups=g)

    _, vjp = jax.vjp(ref, x, wt, off, mask)
    gx_r, gw_r, go_r, gm_r = vjp(ct)
    gx, gw, go, gm = deform_conv2d_pallas_bwd(
        x, wt, off, mask, ct, padding=dilation, dilation=dilation,
        deformable_groups=g, interpret=True)
    for a, b in [(gx, gx_r), (gw, gw_r), (go, go_r), (gm, gm_r)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_pallas_bwd_no_mask():
    from rrnet_tpu.ops.pallas_dcn import deform_conv2d_pallas_bwd

    x, wt, off, _, _ = _make_case(cin=16, cout=16, g=2)
    rng = np.random.RandomState(3)
    out = deform_conv2d(x, wt, off, None, None, deformable_groups=2)
    ct = jnp.asarray(rng.randn(*np.asarray(out).shape), jnp.float32)

    def ref(x_, w_, o_):
        return deform_conv2d(x_, w_, o_, None, None, deformable_groups=2)

    _, vjp = jax.vjp(ref, x, wt, off)
    gx_r, gw_r, go_r = vjp(ct)
    gx, gw, go, gm = deform_conv2d_pallas_bwd(
        x, wt, off, None, ct, deformable_groups=2, interpret=True)
    assert gm is None
    for a, b in [(gx, gx_r), (gw, gw_r), (go, go_r)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_pallas_bwd_stride2():
    from rrnet_tpu.ops.pallas_dcn import deform_conv2d_pallas_bwd

    x, wt, off, mask, _ = _make_case(cin=16, cout=16, g=2, stride=2)
    rng = np.random.RandomState(5)
    out = deform_conv2d(x, wt, off, mask, None, stride=2,
                        deformable_groups=2)
    ct = jnp.asarray(rng.randn(*np.asarray(out).shape), jnp.float32)

    def ref(x_, w_, o_, m_):
        return deform_conv2d(x_, w_, o_, m_, None, stride=2,
                             deformable_groups=2)

    _, vjp = jax.vjp(ref, x, wt, off, mask)
    refs = vjp(ct)
    got = deform_conv2d_pallas_bwd(x, wt, off, mask, ct, stride=2,
                                   deformable_groups=2, interpret=True)
    for a, b in zip(got, refs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_vjp_dispatches_to_pallas_bwd(monkeypatch):
    """jax.grad through deform_conv2d_fused with the Pallas backward
    forced (interpret mode) must match pure-XLA autodiff — proves the
    custom_vjp wiring of the fused backward, including bias."""
    from functools import partial

    from rrnet_tpu.ops import pallas_dcn

    monkeypatch.setattr(pallas_dcn, "deform_conv2d_pallas",
                        partial(deform_conv2d_pallas, interpret=True))
    monkeypatch.setattr(pallas_dcn, "_BWD_MODE", "interpret")

    x, wt, off, mask, bias = _make_case(cin=16, cout=16, g=2)

    def loss_fused(x_, w_, o_, m_, b_):
        return jnp.sum(pallas_dcn.deform_conv2d_fused(
            x_, w_, o_, m_, b_, deformable_groups=2) ** 2)

    def loss_ref(x_, w_, o_, m_, b_):
        return jnp.sum(deform_conv2d(
            x_, w_, o_, m_, b_, deformable_groups=2) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, wt, off, mask, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, wt, off, mask, bias)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_auto_dispatch_cpu_fallback():
    """On the CPU test platform deform_conv2d_auto must take the XLA
    path (pallas TPU kernels can't lower) and match the oracle."""
    from rrnet_tpu.ops.dcn import deform_conv2d_auto
    x, wt, off, mask, bias = _make_case()
    ref = deform_conv2d(x, wt, off, mask, bias, deformable_groups=2)
    got = deform_conv2d_auto(x, wt, off, mask, bias, deformable_groups=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fits_vmem_model():
    from rrnet_tpu.ops.pallas_dcn import fits_vmem
    # trident eval shape: fits
    assert fits_vmem((1, 48, 88, 256), (3, 3, 256, 256),
                     deformable_groups=4, dtype=jnp.bfloat16)
    # absurdly large map: must refuse so auto-dispatch falls back
    assert not fits_vmem((1, 512, 1024, 512), (3, 3, 512, 512),
                         deformable_groups=1, dtype=jnp.bfloat16)
    # channel count not divisible by groups: refuse
    assert not fits_vmem((1, 8, 8, 6), (3, 3, 6, 8), deformable_groups=4)
    # Mosaic block-tiling rule: P = R*Wo must be %8 — (6,6) has no
    # feasible R, so auto-dispatch must fall back to XLA rather than
    # emit a kernel that wedges the Mosaic compile (verified on-rig)
    assert not fits_vmem((1, 6, 6, 4), (3, 3, 4, 4))
    with pytest.raises(ValueError):
        deform_conv2d_pallas(jnp.zeros((1, 6, 6, 4), jnp.float32),
                             jnp.zeros((3, 3, 4, 4), jnp.float32),
                             jnp.zeros((1, 6, 6, 18), jnp.float32),
                             interpret=True)
