"""Modulated deformable convolution v2 + deformable PSROI pooling.

TPU-native replacement for the reference CUDA extension
(`ext/dcn/src/cuda/dcn_v2_im2col_cuda.cu`, `dcn_v2_psroi_pooling_cuda.cu`,
bound via `ext/dcn/dcn_v2.py`). The CUDA design is bilinear-sampled
im2col followed by a batched cuBLAS GEMM; here the sampling is expressed
as differentiable XLA gathers + lerps and the GEMM is an einsum the MXU
executes directly. Coordinate (offset) and mask gradients come from JAX
autodiff through the lerp weights — the same math the hand-written
backward kernels compute (dcn_v2_im2col_cuda.cu:56-123), with no custom
VJP needed.

Conventions follow the torch binding (ext/dcn/dcn_v2.py:97-128):
  * offset channels: first deformable_groups*kh*kw are y-offsets, the
    next deformable_groups*kh*kw are x-offsets (torch.chunk of the
    offset/mask conv output), each ordered (group, tap);
  * mask is post-sigmoid, deformable_groups*kh*kw channels;
  * sampling outside the padded image returns 0
    (dmcn_im2col_bilinear, dcn_v2_im2col_cuda.cu:25-54).

A Pallas kernel for the sampling+GEMM fusion is a follow-up
optimization; this XLA version is the semantic reference and is already
MXU-friendly (one big einsum per image).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample_hw(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Sample img (H, W, C) at float coords ys/xs (...,) -> (..., C).
    Zero outside [-1, H] x [-1, W] bounds like the CUDA sampler."""
    h, w, _ = img.shape
    valid = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0

    def at(yi, xi):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        v = img.reshape(h * w, -1)[yc * w + xc]
        return jnp.where(ok[..., None], v, 0.0)

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    out = (v00 * ((1 - ly) * (1 - lx))[..., None] +
           v01 * ((1 - ly) * lx)[..., None] +
           v10 * (ly * (1 - lx))[..., None] +
           v11 * (ly * lx)[..., None])
    return jnp.where(valid[..., None], out, 0.0)


@partial(jax.jit, static_argnames=("stride", "padding", "dilation",
                                   "deformable_groups"))
def deform_conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    offset: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """Modulated deformable conv (DCNv2).

    x:      (B, H, W, Cin) NHWC
    weight: (kh, kw, Cin, Cout) HWIO
    offset: (B, Ho, Wo, G*2*kh*kw) — [G*kh*kw y-offsets | G*kh*kw x-offsets]
    mask:   (B, Ho, Wo, G*kh*kw) post-sigmoid (None => DCNv1, all ones)
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    g = deformable_groups
    kk = kh * kw

    ho = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    wo = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1

    # base sampling grid per output position and tap
    py = jnp.arange(ho, dtype=jnp.float32) * stride - padding   # (Ho,)
    px = jnp.arange(wo, dtype=jnp.float32) * stride - padding   # (Wo,)
    ky = jnp.repeat(jnp.arange(kh, dtype=jnp.float32), kw) * dilation  # (kk,)
    kx = jnp.tile(jnp.arange(kw, dtype=jnp.float32), kh) * dilation

    base_y = py[:, None, None] + ky[None, None, :]      # (Ho, 1, kk)
    base_x = px[None, :, None] + kx[None, None, :]      # (1, Wo, kk)

    def one(img, off, msk):
        off = off.reshape(ho, wo, 2, g, kk)
        off_y = off[:, :, 0]                            # (Ho, Wo, G, kk)
        off_x = off[:, :, 1]
        ys = base_y[:, :, None, :] + off_y              # (Ho, Wo, G, kk)
        xs = base_x[:, :, None, :] + off_x
        # each input channel uses its own group's sampling, so gather
        # each group's channel slice at that group's coordinates —
        # sampling all Cin for every group and taking the (G, Cin)
        # diagonal costs G x the gather traffic (measured 4.6x slower
        # at g=4, DCN_BENCH.json)
        cpg = cin // g
        m = None if msk is None else msk.reshape(ho, wo, g, kk)
        parts = []
        for gi in range(g):
            s = _bilinear_sample_hw(
                img[..., gi * cpg:(gi + 1) * cpg],
                ys[:, :, gi], xs[:, :, gi])             # (Ho, Wo, kk, cpg)
            if m is not None:
                s = s * m[:, :, gi][..., None]
            parts.append(s)
        sampled = jnp.concatenate(parts, axis=-1)       # (Ho, Wo, kk, Cin)
        wmat = weight.reshape(kk, cin, cout)
        acc = jnp.promote_types(sampled.dtype, jnp.float32)
        return jnp.einsum("hwtc,tco->hwo", sampled, wmat,
                          preferred_element_type=acc)

    # avoid the (G, Cin) blow-up when g == 1 (the common case)
    if g == 1:
        def one(img, off, msk):  # noqa: F811
            off = off.reshape(ho, wo, 2, kk)
            ys = base_y + off[:, :, 0]
            xs = base_x + off[:, :, 1]
            sampled = _bilinear_sample_hw(img, ys, xs)  # (Ho, Wo, kk, Cin)
            if msk is not None:
                sampled = sampled * msk.reshape(ho, wo, kk)[..., None]
            wmat = weight.reshape(kk, cin, cout)
            acc = jnp.promote_types(sampled.dtype, jnp.float32)
            return jnp.einsum("hwtc,tco->hwo", sampled, wmat,
                              preferred_element_type=acc)

    if mask is None:
        out = jax.vmap(lambda i, o: one(i, o, None))(x, offset)
    else:
        out = jax.vmap(one)(x, offset, mask)
    if bias is not None:
        out = out + bias
    return out


@partial(jax.jit, static_argnames=("pooled_size", "output_dim", "group_size",
                                   "part_size", "sample_per_part", "no_trans"))
def deform_psroi_pooling(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    trans: Optional[jnp.ndarray],
    spatial_scale: float = 1.0,
    pooled_size: int = 7,
    output_dim: int = 256,
    group_size: int = 1,
    part_size: Optional[int] = None,
    sample_per_part: int = 4,
    trans_std: float = 0.0,
    no_trans: bool = False,
) -> jnp.ndarray:
    """Deformable position-sensitive ROI pooling
    (ext/dcn/src/cuda/dcn_v2_psroi_pooling_cuda.cu:59-148).

    feat: (H, W, C) with C == output_dim * group_size^2 position-
          sensitive channels; rois: (R, 5) [batch_idx(ignored here),
          x1, y1, x2, y2]; trans: (R, 2, part, part) offsets or None.
    Returns (R, pooled, pooled, output_dim).
    """
    h, w, c = feat.shape
    part = part_size or pooled_size
    p = pooled_size
    sp = sample_per_part

    x1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    x2 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)
    bin_w = roi_w / p
    bin_h = roi_h / p
    sub_w = bin_w / sp
    sub_h = bin_h / sp

    ph = jnp.arange(p)
    pw = jnp.arange(p)

    def one_roi(rx1, ry1, bw, bh, sw, sh, tr):
        # per-bin trans offsets
        part_h = jnp.floor(ph[:, None] / p * part).astype(jnp.int32)  # (p,1)
        part_w = jnp.floor(pw[None, :] / p * part).astype(jnp.int32)  # (1,p)
        if no_trans or tr is None:
            off_x = jnp.zeros((p, p))
            off_y = jnp.zeros((p, p))
        else:
            off_x = tr[0][part_h, part_w] * trans_std
            off_y = tr[1][part_h, part_w] * trans_std

        # CUDA: wstart = pw*bin_w + roi_start_w + trans_x * roi_w
        start_x = rx1 + bw * pw[None, :] + off_x * (bw * p)
        start_y = ry1 + bh * ph[:, None] + off_y * (bh * p)

        iy = (jnp.arange(sp) + 0.5) * sh                     # (sp,)
        ix = (jnp.arange(sp) + 0.5) * sw
        ys = start_y[:, :, None, None] + iy[None, None, :, None]
        xs = start_x[:, :, None, None] + ix[None, None, None, :]
        ys = jnp.clip(ys, 0.0, h - 1.0)
        xs = jnp.clip(xs, 0.0, w - 1.0)
        vals = _bilinear_sample_hw(feat, ys, xs)   # (p, p, sp, sp, C)
        pooled = vals.mean(axis=(2, 3))            # (p, p, C)
        # position-sensitive channel selection:
        # c_out channel at bin (i, j) reads channel
        # (c_out*gs + gh)*gs + gw where gh/gw = bin group coords
        gs = group_size
        if gs == 1:
            return pooled[:, :, :output_dim]
        gh = jnp.clip((ph[:, None] * gs) // p, 0, gs - 1)
        gw = jnp.clip((pw[None, :] * gs) // p, 0, gs - 1)
        cidx = (jnp.arange(output_dim)[None, None, :] * gs +
                gh[..., None]) * gs + gw[..., None]
        return jnp.take_along_axis(pooled, cidx, axis=-1)

    if trans is None or no_trans:
        return jax.vmap(lambda a, b, c_, d, e, f: one_roi(a, b, c_, d, e, f, None)
                        )(x1, y1, bin_w, bin_h, sub_w, sub_h)
    return jax.vmap(one_roi)(x1, y1, bin_w, bin_h, sub_w, sub_h, trans)


def deform_conv2d_auto(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    offset: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """deform_conv2d that picks the fused Pallas forward on TPU.

    On a TPU backend, when the kernel's VMEM model says the shape fits
    (ops/pallas_dcn.py::fits_vmem), dispatch to deform_conv2d_fused —
    the single-program sampling+mask+GEMM kernel with the XLA backward
    wired through custom_vjp (safe under jax.grad). Everywhere else
    (CPU tests, oversized shapes) fall back to the XLA gather+einsum.
    Dispatch is a trace-time decision: shapes and backend are static.
    """
    if jax.default_backend() in ("tpu", "axon"):
        from rrnet_tpu.ops.pallas_dcn import deform_conv2d_fused, fits_vmem
        if fits_vmem(x.shape, weight.shape, stride=stride, padding=padding,
                     dilation=dilation, deformable_groups=deformable_groups,
                     dtype=x.dtype):
            return deform_conv2d_fused(
                x, weight, offset, mask, bias,
                stride, padding, dilation, deformable_groups)
    return deform_conv2d(
        x, weight, offset, mask, bias, stride=stride, padding=padding,
        dilation=dilation, deformable_groups=deformable_groups)
