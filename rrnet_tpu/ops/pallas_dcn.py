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


def _pick_rows(ho, wo, h, w, cin, cout, g, kh, kw, itemsize,
               require_tiling=True) -> int:
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
    if require_tiling and (h % 8 or cpg % 8):
        return 0       # img block (1,g,H,W*cpg) / weight block
                       # (g,kk,cpg,cout): second-to-last dims must be %8
                       # — the same Mosaic rule enforced for P below and
                       # for the backward in _pick_rows_bwd; interpret
                       # mode (CPU tests) has no tiling constraint
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
    r_rows = _pick_rows(ho, wo, h, w, cin, cout, g, kh, kw, itemsize,
                        require_tiling=not interpret)
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
# fused backward kernel
# ---------------------------------------------------------------------------
#
# The reference hand-writes three CUDA backward kernels
# (ext/dcn/src/cuda/dcn_v2_im2col_cuda.cu:56-123: grad-weight via GEMM on
# the stored im2col buffer, col2im for grad-input, col2im_coord for the
# offset/mask grads). Here the whole backward is the forward's tent-matmul
# trick TRANSPOSED, in one VMEM-resident program per row-chunk:
#
#   g_sm   = ct @ W[g,t]^T                  (p, cpg)   MXU
#   g_W   += sm^T @ ct                      (cpg, Cout) MXU, grid-accumulated
#   g_mask = sum_c(g_sm * s)                lane reduction
#   g_sv   = (g_s) @ fold^T                 broadcast back over x-groups, MXU
#   g_v    = g_sv * wx ;  g_wx = g_sv * v   VPU
#   g_xs   = sum_l(g_wx * tent'(xs-lane))   lane reduction  -> grad offset x
#   g_img += wy^T @ g_v                     (H, W*cpg) MXU, grid-accumulated
#   g_wy   = g_v @ img^T                    (p, H) MXU
#   g_ys   = sum_h(g_wy * tent'(ys-iota))   lane reduction  -> grad offset y
#
# tent'(d) = -sign(d) for |d| < 1 else 0 — exactly the lerp-weight
# gradients XLA autodiff derives through ops/dcn.py (the oracle the tests
# compare against). The im2col buffer the CUDA version re-reads from HBM
# is recomputed in VMEM instead (v/s are two tent matmuls — cheaper than
# an HBM round-trip on TPU).
#
# Grid accumulation: TPU grids run sequentially, so outputs whose index
# map ignores a grid dim are reduction outputs — g_img ignores the
# row-chunk dim j (zeroed at j==0), g_W ignores both i and j (zeroed at
# i==j==0). Revisits are consecutive, which Mosaic requires.


def _pick_rows_bwd(ho, wo, h, w, cin, cout, g, kh, kw, itemsize,
                   require_tiling=True) -> int:
    """Row-chunk picker for the backward kernel. Same %8 tiling rule as
    the forward (plus h and cpg, which sit in second-to-last block dims
    of the image/weight/grad blocks); the working set adds the f32
    grad-image and grad-weight accumulators, the ct block and the
    g_sv/g_v/g_wx transposed-tent intermediates."""
    cpg = cin // g
    if require_tiling and (h % 8 or cpg % 8):
        return 0
    fixed = (h * w * cin * itemsize +              # image block
             kh * kw * cin * cout * itemsize +     # weight block
             w * cpg * cpg * itemsize +            # fold matrix
             h * w * cin * 4 +                     # grad-image accumulator
             g * kh * kw * cpg * cout * 4)         # grad-weight accumulator
    for r in (8, 4, 2, 1):
        if ho % r:
            continue
        p = r * wo
        if p % 8:
            continue                               # Mosaic tiling rule
        per_tap = 6 * p * w * cpg * itemsize       # v/wx/sv + g_sv/g_v/g_wx
        f32_side = 3 * p * w * cpg * 4             # lane_x, tent', f32 casts
        acc = p * cout * (itemsize + 4) + 4 * p * h * 4
        need = fixed + per_tap + f32_side + acc
        if itemsize == 4:
            # calibrated on-chip 2026-08-21: an all-f32 chain keeps far
            # more of the unrolled g*kk temporaries live than this model
            # counts — (2,32,32,256) g=4 f32 measured 27.14 MB scoped
            # VMEM vs 12.2 MB predicted (r=2). 2.25x reproduces that
            # point (27.5 MB -> rejected, falls back to XLA autodiff)
            # while the small f32 selftest case stays accepted
            # (CHIP_SELFTEST small_g2_f32 runs at ~6.6 MB modeled).
            need = int(need * 2.25)
        if need <= _VMEM_BUDGET:
            return r
    return 0


def bwd_fits_vmem(x_shape, w_shape, *, stride=1, padding=1, dilation=1,
                  deformable_groups=1, dtype=None) -> bool:
    """Trace-time feasibility check for the fused backward.

    f32 shapes carry a calibrated 2.25x liveness factor (see
    _pick_rows_bwd) — without it an f32 train-shape dispatch crashes
    the Mosaic compile instead of falling back to XLA autodiff."""
    b, h, w, cin = x_shape
    kh, kw, _, cout = w_shape
    if cin % deformable_groups:
        return False
    ho = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    wo = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    if min(b, ho, wo) <= 0:
        return False
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    return _pick_rows_bwd(ho, wo, h, w, cin, cout, deformable_groups,
                          kh, kw, itemsize) > 0


def _dcn_bwd_kernel(img_ref, off_ref, mask_ref, w_ref, ct_ref,
                    gimg_ref, goff_ref, gmask_ref, gw_ref, *,
                    stride, padding, dilation, g, kh, kw, r_rows, wo, h, w,
                    cpg, cout, has_mask, cdtype):
    """One program: all backward quantities for r_rows output rows.

    Ref shapes mirror the forward kernel's, plus:
    ct_ref:    (1, P, Cout)        f32 upstream cotangent
    gimg_ref:  (1, G, H, W*cpg)    f32, accumulated over the j grid dim
    goff_ref:  (1, P, G*2*kk)      f32  [y cols | x cols], (g, tap) order
    gmask_ref: (1, P, G*kk)        f32  (zeros when has_mask=False)
    gw_ref:    (G, kk, cpg, Cout)  f32, accumulated over the whole grid
    """
    kk = kh * kw
    p = r_rows * wo
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = j * r_rows

    @pl.when(j == 0)
    def _zero_gimg():
        for gi in range(g):                      # 2D writes only (Mosaic)
            gimg_ref[0, gi] = jnp.zeros((h, w * cpg), jnp.float32)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _zero_gw():
        for gi in range(g):
            for t in range(kk):
                gw_ref[gi, t] = jnp.zeros((cpg, cout), jnp.float32)

    off = off_ref[0].astype(jnp.float32)
    msk = mask_ref[0].astype(jnp.float32)
    ct = ct_ref[0].astype(cdtype)                    # (p, Cout)

    local = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    out_y = row0 + local // wo
    out_x = local % wo
    py = out_y.astype(jnp.float32) * stride - padding
    px = out_x.astype(jnp.float32) * stride - padding

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (p, h), 1).astype(jnp.float32)
    lane_x = (jax.lax.broadcasted_iota(
        jnp.int32, (p, w * cpg), 1) // cpg).astype(jnp.float32)
    fold = (jax.lax.broadcasted_iota(jnp.int32, (w * cpg, cpg), 0) % cpg ==
            jax.lax.broadcasted_iota(jnp.int32, (w * cpg, cpg), 1)
            ).astype(cdtype)

    def tent_deriv(d):
        return jnp.where(jnp.abs(d) < 1.0, -jnp.sign(d), 0.0)

    goff_y = []
    goff_x = []
    gmask_cols = []
    for gi in range(g):
        img_g = img_ref[0, gi]                       # (H, W*cpg)
        gimg_acc = jnp.zeros((h, w * cpg), jnp.float32)
        for t in range(kk):
            ky = (t // kw) * dilation
            kx = (t % kw) * dilation
            ys = py + ky + off[:, gi * kk + t][:, None]
            xs = px + kx + off[:, g * kk + gi * kk + t][:, None]

            # ---- recompute the forward sampling chain in VMEM ----
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys - iota_h))    # (p, H)
            wy_c = wy.astype(cdtype)
            v = jax.lax.dot_general(
                wy_c, img_g, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ).astype(cdtype)                                     # (p, W*cpg)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - lane_x))
            wx_c = wx.astype(cdtype)
            sv = v * wx_c
            s = jax.lax.dot_general(
                sv, fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # (p, cpg)

            # ---- transposed chain ----
            g_sm = jax.lax.dot_general(
                ct, w_ref[gi, t], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)              # (p, cpg)
            if has_mask:
                m_col = msk[:, gi * kk + t][:, None]             # (p, 1)
                sm = s * m_col
                gmask_cols.append(jnp.sum(g_sm * s, axis=1, keepdims=True))
                g_s = g_sm * m_col
            else:
                sm = s
                g_s = g_sm

            # grad-weight: sm^T @ ct, accumulated across the grid
            gw_ref[gi, t] = gw_ref[gi, t] + jax.lax.dot_general(
                sm.astype(cdtype), ct, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # (cpg, Cout)

            # broadcast g_s back over the x-groups (fold transposed).
            # NOTE: a W-way lane concat would express this as pure data
            # movement, but Mosaic materializes each pairwise concat
            # temporary (measured 28 MB scoped VMEM vs 13 MB with the
            # matmul at train_512) — the MXU matmul is the cheaper form.
            g_sv = jax.lax.dot_general(
                g_s.astype(cdtype), fold, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ).astype(cdtype)                                     # (p, W*cpg)
            g_v = g_sv * wx_c
            g_wx = (g_sv * v).astype(jnp.float32)

            g_xs = jnp.sum(g_wx * tent_deriv(xs - lane_x),
                           axis=1, keepdims=True)                # (p, 1)

            gimg_acc += jax.lax.dot_general(
                wy_c, g_v, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # (H, W*cpg)

            g_wy = jax.lax.dot_general(
                g_v, img_g, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)              # (p, H)
            g_ys = jnp.sum(g_wy * tent_deriv(ys - iota_h),
                           axis=1, keepdims=True)                # (p, 1)

            goff_y.append(g_ys)
            goff_x.append(g_xs)
        gimg_ref[0, gi] = gimg_ref[0, gi] + gimg_acc

    goff_ref[0] = jnp.concatenate(goff_y + goff_x, axis=1)
    if has_mask:
        gmask_ref[0] = jnp.concatenate(gmask_cols, axis=1)
    else:
        gmask_ref[0] = jnp.zeros_like(gmask_ref[0])


@partial(jax.jit, static_argnames=("stride", "padding", "dilation",
                                   "deformable_groups", "interpret"))
def deform_conv2d_pallas_bwd(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    offset: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    ct: jnp.ndarray,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    deformable_groups: int = 1,
    interpret: bool = False,
):
    """Fused backward: returns (grad_x, grad_weight, grad_offset,
    grad_mask) for upstream cotangent ct of shape (B, Ho, Wo, Cout).
    grad_mask is None when mask is None. grad_bias (a plain sum over ct)
    is the caller's one-liner."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    g = deformable_groups
    kk = kh * kw
    cpg = cin // g
    assert cin % g == 0

    ho = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    wo = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1

    cdtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    itemsize = 2 if cdtype == jnp.bfloat16 else 4
    r_rows = _pick_rows_bwd(ho, wo, h, w, cin, cout, g, kh, kw, itemsize,
                            require_tiling=not interpret)
    if not r_rows:
        raise ValueError(
            f"deform_conv2d_pallas_bwd: shape x={x.shape} w={weight.shape} "
            "is not Pallas-feasible; use bwd_fits_vmem() and fall back to "
            "the XLA autodiff backward")

    img = x.astype(cdtype).reshape(b, h, w, g, cpg)
    img = img.transpose(0, 3, 1, 2, 4).reshape(b, g, h, w * cpg)
    wmat = weight.astype(cdtype).reshape(kh * kw, g, cpg, cout)
    wmat = wmat.transpose(1, 0, 2, 3)
    if mask is None:
        mask_arr = jnp.ones((b, ho, wo, g * kk), jnp.float32)
        has_mask = False
    else:
        mask_arr = mask.astype(jnp.float32)
        has_mask = True

    kernel = partial(_dcn_bwd_kernel, stride=stride, padding=padding,
                     dilation=dilation, g=g, kh=kh, kw=kw, r_rows=r_rows,
                     wo=wo, h=h, w=w, cpg=cpg, cout=cout,
                     has_mask=has_mask, cdtype=cdtype)

    p = r_rows * wo
    off_flat = offset.astype(jnp.float32).reshape(b, ho * wo, g * 2 * kk)
    mask_flat = mask_arr.reshape(b, ho * wo, g * kk)
    ct_flat = ct.astype(jnp.float32).reshape(b, ho * wo, cout)

    gimg, goff, gmask, gw = pl.pallas_call(
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
            pl.BlockSpec((1, p, cout), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, g, h, w * cpg), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, g * 2 * kk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, g * kk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, kk, cpg, cout), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, g, h, w * cpg), jnp.float32),
            jax.ShapeDtypeStruct((b, ho * wo, g * 2 * kk), jnp.float32),
            jax.ShapeDtypeStruct((b, ho * wo, g * kk), jnp.float32),
            jax.ShapeDtypeStruct((g, kk, cpg, cout), jnp.float32),
        ],
        interpret=interpret,
    )(img, off_flat, mask_flat, wmat, ct_flat)

    grad_x = gimg.reshape(b, g, h, w, cpg).transpose(0, 2, 3, 1, 4)
    grad_x = grad_x.reshape(b, h, w, cin).astype(x.dtype)
    grad_w = gw.transpose(1, 0, 2, 3).reshape(kh, kw, cin, cout)
    grad_w = grad_w.astype(weight.dtype)
    grad_off = goff.reshape(b, ho, wo, g * 2 * kk).astype(offset.dtype)
    grad_mask = (gmask.reshape(b, ho, wo, g * kk).astype(mask.dtype)
                 if mask is not None else None)
    return grad_x, grad_w, grad_off, grad_mask


# ---------------------------------------------------------------------------
# custom-vjp wrapper: Pallas forward, XLA-autodiff backward
# ---------------------------------------------------------------------------

# Backward dispatch override, for tests: "auto" picks the fused Pallas
# backward on TPU when it fits VMEM (else XLA autodiff); "xla" forces the
# XLA backward; "interpret" forces the Pallas backward in interpret mode
# (runnable on the CPU test platform).
_BWD_MODE = "auto"


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def deform_conv2d_fused(x, weight, offset, mask, bias,
                        stride=1, padding=1, dilation=1,
                        deformable_groups=1):
    """deform_conv2d with the fused Pallas forward and, when feasible,
    the fused Pallas backward (the transposed tent-matmul program above —
    the same lerp-weight gradients dcn_v2_im2col_cuda.cu:56-123
    hand-codes); infeasible shapes or non-TPU backends fall back to XLA
    autodiff through ops.dcn. Call through ops.dcn-style keyword args;
    mask/bias may be None."""
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
    ct = ct.astype(jnp.promote_types(x.dtype, jnp.float32))

    # deformable_groups == 1 stays on the XLA backward: with one group
    # the gather+einsum autodiff already vectorizes well and beats the
    # fused kernel (DCN_BENCH g1_512: 2.84 ms XLA vs 4.93 ms fused)
    use_pallas = _BWD_MODE == "interpret" or (
        _BWD_MODE == "auto" and jax.default_backend() in ("tpu", "axon") and
        deformable_groups > 1 and
        bwd_fits_vmem(x.shape, weight.shape, stride=stride, padding=padding,
                      dilation=dilation, deformable_groups=deformable_groups,
                      dtype=x.dtype))
    if use_pallas:
        gx, gw, goff, gmask = deform_conv2d_pallas_bwd(
            x, weight, offset, mask, ct, stride=stride, padding=padding,
            dilation=dilation, deformable_groups=deformable_groups,
            interpret=_BWD_MODE == "interpret")
        gbias = (jnp.sum(ct, axis=(0, 1, 2)).astype(bias.dtype)
                 if bias is not None else None)
        return gx, gw, goff, gmask, gbias

    def ref(x_, w_, o_, m_, b_):
        return _dcn_xla.deform_conv2d(
            x_, w_, o_, m_, b_, stride=stride, padding=padding,
            dilation=dilation, deformable_groups=deformable_groups)

    _, vjp = jax.vjp(ref, x, weight, offset, mask, bias)
    return vjp(ct)


deform_conv2d_fused.defvjp(_fused_fwd, _fused_bwd)
