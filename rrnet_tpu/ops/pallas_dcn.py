"""Fused Pallas kernel for modulated deformable conv v2 (forward).

Replaces the XLA gather+einsum path of `ops/dcn.py::deform_conv2d` on
TPU. The reference CUDA kernel family
(`ext/dcn/src/cuda/dcn_v2_im2col_cuda.cu:25-401`) is bilinear-sampled
im2col followed by a cuBLAS GEMM; a literal port would need per-element
gathers, which the TPU has no fast path for (XLA lowers them to serial
dynamic-slices — DCN_BENCH.json r3 measured the gather formulation at
2-3x a plain conv's wall time, far off the arithmetic floor).

TPU-native reformulation — bilinear sampling IS a pair of tiny dense
matmuls:

    sample(img, y, x) = sum_{yi} wy(yi) * sum_{xi} wx(xi) * img[yi, xi]
    with  wy(yi) = relu(1 - |y - yi|)    (a "tent": <= 2 nonzeros)

so for a row of output positions the y-interpolation of ALL samples is
one (P, H) x (H, W*C) matmul on the MXU (the tent matrix is the
one-hot-gather trick, with the bilinear weights folded in), and the
x-interpolation is a lane-wise tent multiply + per-x-group reduction.
The mask multiply and the conv GEMM fuse into the same VMEM-resident
program, so the (Ho*Wo, kh*kw*Cin) im2col tensor that the CUDA version
writes to global memory never exists in HBM here.

Out-of-bounds semantics match the CUDA sampler exactly: a tent weight
is zero outside [0, H) / [0, W), which reproduces both the zero-corner
contribution and the "ys <= -1 or >= H samples are zero" rule
(dmcn_im2col_bilinear, dcn_v2_im2col_cuda.cu:25-54) — verified against
the XLA implementation in tests/test_pallas_dcn.py.

Forward only: training uses the autodiff-friendly XLA path (gradients
through tent weights are the same lerp-weight gradients the CUDA
backward computes); `deform_conv2d_fused` wires this kernel as the
custom-vjp forward with the XLA backward, so it is safe under jax.grad.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rrnet_tpu.ops import dcn as _dcn_xla

_VMEM_BUDGET = 15 * 1024 * 1024   # calibrated: the r4 model charged 12 MB
                                  # but omitted lane_x/fold (below); the
                                  # eval_768x1408 R=2 case that runs fine on
                                  # the chip totals ~14.1 MB under this model


def _pick_rows(ho, wo, h, w, cin, cout, g, kh, kw, itemsize) -> int:
    """Largest feasible row-chunk R dividing Ho, 0 if none fits VMEM.

    Feasibility = (a) the VMEM working-set model below and (b) Mosaic's
    block-tiling rule: our offset/mask/out blocks have second-to-last
    dim P = R*Wo, which must be divisible by 8 (f32 sublane). No
    full-array exemption: a (1, Ho*Wo, C) block with Ho*Wo % 8 != 0
    WEDGES the Mosaic compile on this backend (verified 2026-08-21 —
    same failure mode as while_loop-in-pallas; see the axon rig notes),
    so non-aligned shapes must fall back to the XLA path.
    Large buffers: image/weights/V/wx/V*wx in the compute dtype, plus
    the f32 lane_x iota (the tent inputs are materialized in f32 before
    the .astype casts) and the (W*cpg, cpg) fold matrix."""
    cpg = cin // g
    fixed = (h * w * cin * itemsize +              # image block
             kh * kw * cin * cout * itemsize +     # weight block
             w * cpg * cpg * itemsize)             # x-group fold matrix
    for r in (8, 4, 2, 1):
        if ho % r:
            continue
        p = r * wo
        if p % 8:
            continue                               # Mosaic tiling rule
        per_tap = 3 * p * w * cpg * itemsize       # V, wx, V*wx (compute dtype)
        f32_side = p * w * cpg * 4                 # lane_x iota (f32)
        acc = p * cout * 4 + 2 * p * h * 4         # accumulator + y-tent/iota
        if fixed + per_tap + f32_side + acc <= _VMEM_BUDGET:
            return r
    return 0


def fits_vmem(x_shape, w_shape, *, stride=1, padding=1, dilation=1,
              deformable_groups=1, dtype=None) -> bool:
    """Trace-time feasibility check for deform_conv2d_auto dispatch."""
    b, h, w, cin = x_shape
    kh, kw, _, cout = w_shape
    if cin % deformable_groups:
        return False
    ho = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    wo = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    if min(b, ho, wo) <= 0:
        return False
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    return _pick_rows(ho, wo, h, w, cin, cout, deformable_groups,
                      kh, kw, itemsize) > 0


def _dcn_kernel(img_ref, off_ref, mask_ref, w_ref, out_ref, *,
                stride, padding, dilation, g, kh, kw, r_rows, wo, h, w,
                cpg, cout, has_mask, cdtype):
    """One program computes r_rows full output rows (all taps, groups).

    Mosaic constraint: no 2D<->3D shape casts inside the kernel, so all
    spatially-indexed refs arrive with (Ho*Wo) already flattened and the
    strided x-group reduction is a matmul with a constant 0/1 fold
    matrix instead of a reshape+sum.

    img_ref:  (1, G, H, W*cpg)      activation-dtype
    off_ref:  (1, P, G*2*kk)        f32  [y cols | x cols], (g, tap) order
    mask_ref: (1, P, G*kk)          f32  (all-ones when has_mask=False)
    w_ref:    (G, kk, cpg, Cout)    activation-dtype
    out_ref:  (1, P, Cout)          f32        (P = r_rows * Wo)
    """
    kk = kh * kw
    p = r_rows * wo
    row0 = pl.program_id(1) * r_rows

    off = off_ref[0].astype(jnp.float32)
    msk = mask_ref[0].astype(jnp.float32)

    # base sampling coords per sample (absolute output row / col)
    local = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    out_y = row0 + local // wo                       # (p, 1)
    out_x = local % wo                               # (p, 1)
    py = out_y.astype(jnp.float32) * stride - padding
    px = out_x.astype(jnp.float32) * stride - padding

    # mosaic only lowers integer iota; cast after
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (p, h), 1).astype(jnp.float32)
    lane_x = (jax.lax.broadcasted_iota(
        jnp.int32, (p, w * cpg), 1) // cpg).astype(jnp.float32)

    # constant fold matrix: F[x*cpg + c, c] = 1 — the per-x-group sum
    # (p, W*cpg) -> (p, cpg) as one MXU matmul, replacing the
    # reshape(p, w, cpg).sum(axis=1) Mosaic cannot lower. The fold is
    # exact 0/1 selection, so running it in the compute dtype is safe;
    # the MXU accumulates in f32 either way.
    fold = (jax.lax.broadcasted_iota(jnp.int32, (w * cpg, cpg), 0) % cpg ==
            jax.lax.broadcasted_iota(jnp.int32, (w * cpg, cpg), 1)
            ).astype(cdtype)

    acc = jnp.zeros((p, cout), jnp.float32)
    for gi in range(g):
        img_g = img_ref[0, gi]                       # (H, W*cpg)
        for t in range(kk):
            ky = (t // kw) * dilation
            kx = (t % kw) * dilation
            ys = py + ky + off[:, gi * kk + t][:, None]          # (p, 1)
            xs = px + kx + off[:, g * kk + gi * kk + t][:, None]

            # y-interpolation as an MXU matmul with a 2-nnz tent matrix
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys - iota_h))    # (p, H)
            # keep v in the compute dtype: halves the dominant VMEM
            # buffers, which doubles r_rows at the big eval shapes
            # (Mosaic requires a 32-bit matmul accumulator, so cast
            # after the dot rather than via preferred_element_type)
            v = jax.lax.dot_general(
                wy.astype(cdtype), img_g,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ).astype(cdtype)                                     # (p, W*cpg)

            # x-interpolation: lane-wise tent multiply, then fold the
            # W lane-groups of cpg lanes down to (p, cpg) on the MXU
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - lane_x))
            sv = v * wx.astype(cdtype)
            s = jax.lax.dot_general(
                sv, fold,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # (p, cpg)

            if has_mask:
                s = s * msk[:, gi * kk + t][:, None]

            acc += jax.lax.dot_general(
                s.astype(cdtype), w_ref[gi, t],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # (p, Cout)

    out_ref[0] = acc


@partial(jax.jit, static_argnames=("stride", "padding", "dilation",
                                   "deformable_groups", "interpret"))
def deform_conv2d_pallas(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    offset: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    deformable_groups: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused-forward DCNv2; same signature/semantics as
    ops.dcn.deform_conv2d."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    g = deformable_groups
    kk = kh * kw
    cpg = cin // g
    assert cin % g == 0

    ho = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    wo = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1

    cdtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

    # pick the row-chunk size from the shared VMEM model (the (P, W*cpg)
    # intermediates dominate); callers should have checked fits_vmem().
    # Refuse rather than degrade: an infeasible shape either exceeds
    # VMEM or violates the %8 tiling rule, and the latter wedges the
    # Mosaic compile on this backend instead of erroring.
    itemsize = 2 if cdtype == jnp.bfloat16 else 4
    r_rows = _pick_rows(ho, wo, h, w, cin, cout, g, kh, kw, itemsize)
    if not r_rows:
        raise ValueError(
            f"deform_conv2d_pallas: shape x={x.shape} w={weight.shape} is "
            "not Pallas-feasible (VMEM or %8 tiling); use fits_vmem() and "
            "fall back to ops.dcn.deform_conv2d")

    # (B, G, H, W*cpg): per-group slices contiguous on lanes
    img = x.astype(cdtype).reshape(b, h, w, g, cpg)
    img = img.transpose(0, 3, 1, 2, 4).reshape(b, g, h, w * cpg)
    wmat = weight.astype(cdtype).reshape(kh * kw, g, cpg, cout)
    wmat = wmat.transpose(1, 0, 2, 3)                 # (G, kk, cpg, Cout)
    if mask is None:
        mask_arr = jnp.ones((b, ho, wo, g * kk), jnp.float32)
        has_mask = False
    else:
        mask_arr = mask.astype(jnp.float32)
        has_mask = True

    kernel = partial(_dcn_kernel, stride=stride, padding=padding,
                     dilation=dilation, g=g, kh=kh, kw=kw, r_rows=r_rows,
                     wo=wo, h=h, w=w, cpg=cpg, cout=cout,
                     has_mask=has_mask, cdtype=cdtype)

    # spatial dims flattened to (Ho*Wo) outside the kernel: Mosaic
    # cannot lower 2D<->3D shape casts, so refs must already be 2D-lane
    p = r_rows * wo
    off_flat = offset.astype(jnp.float32).reshape(b, ho * wo, g * 2 * kk)
    mask_flat = mask_arr.reshape(b, ho * wo, g * kk)

    out = pl.pallas_call(
        kernel,
        grid=(b, ho // r_rows),
        in_specs=[
            pl.BlockSpec((1, g, h, w * cpg), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, g * 2 * kk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, g * kk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, kk, cpg, cout), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, cout), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho * wo, cout), jnp.float32),
        interpret=interpret,
    )(img, off_flat, mask_flat, wmat)
    out = out.reshape(b, ho, wo, cout)

    out = out.astype(jnp.promote_types(x.dtype, jnp.float32))
    if bias is not None:
        out = out + bias
    return out


# ---------------------------------------------------------------------------
# custom-vjp wrapper: Pallas forward, XLA-autodiff backward
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def deform_conv2d_fused(x, weight, offset, mask, bias,
                        stride=1, padding=1, dilation=1,
                        deformable_groups=1):
    """deform_conv2d with the fused Pallas forward and the XLA
    gather+einsum backward (the gradients autodiff derives there are the
    same lerp-weight gradients dcn_v2_im2col_cuda.cu:56-123 hand-codes).
    Call through ops.dcn-style keyword args; mask/bias may be None."""
    return deform_conv2d_pallas(
        x, weight, offset, mask, bias, stride=stride, padding=padding,
        dilation=dilation, deformable_groups=deformable_groups)


def _fused_fwd(x, weight, offset, mask, bias,
               stride, padding, dilation, deformable_groups):
    out = deform_conv2d_pallas(
        x, weight, offset, mask, bias, stride=stride, padding=padding,
        dilation=dilation, deformable_groups=deformable_groups)
    return out, (x, weight, offset, mask, bias)


def _fused_bwd(stride, padding, dilation, deformable_groups,
               residuals, ct):
    x, weight, offset, mask, bias = residuals

    def ref(x_, w_, o_, m_, b_):
        return _dcn_xla.deform_conv2d(
            x_, w_, o_, m_, b_, stride=stride, padding=padding,
            dilation=dilation, deformable_groups=deformable_groups)

    _, vjp = jax.vjp(ref, x, weight, offset, mask, bias)
    return vjp(ct.astype(jnp.promote_types(x.dtype, jnp.float32)))


deform_conv2d_fused.defvjp(_fused_fwd, _fused_bwd)
