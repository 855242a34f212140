"""Deformable-conv (DCNv2) TPU microbenchmark.

Measures `ops.dcn.deform_conv2d` forward and forward+backward at the
shapes trident-deform actually runs (the shared 3x3 inside TridentUnit:
stride-16 C4 feature map, Cin=Cout mid channels, deformable_groups=4 —
reference `backbones/Trident_resnet.py` trident blocks), against a plain
3x3 conv at the same shape as the reference point. Records results into
DCN_BENCH.json so the "DCNv2 performance is unmeasured" gap stays
closed round over round.

Timing protocol: per-dispatch RPC on this rig is ~5 ms and
block_until_ready can return early (PERF.md), so each measurement runs
`steps` chained iterations inside one python loop with a data dependency
and forces a scalar fetch at the end.

Usage: python scripts/bench_dcn.py [--steps 20] [--out DCN_BENCH.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_chained(fn, args, steps: int) -> float:
    """Median-of-3 of (chained steps) wall time, seconds per call."""
    import jax

    out = fn(*args)                       # compile + warmup
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    runs = []
    for _ in range(3):
        t0 = time.time()
        acc = None
        for _ in range(steps):
            out = fn(*args)
            acc = out
        # force the chain: fetch one scalar from the last output
        leaf = jax.tree_util.tree_leaves(acc)[0]
        float(leaf.reshape(-1)[0])
        runs.append((time.time() - t0) / steps)
    return sorted(runs)[1]


def bench_case(name: str, b: int, h: int, w: int, c: int, g: int,
               dilation: int, steps: int, dtype_name: str) -> dict:
    import jax
    import jax.numpy as jnp

    from rrnet_tpu.ops.dcn import deform_conv2d

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    k, kk = 3, 9
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c), dtype)
    wgt = jnp.asarray(rng.randn(k, k, c, c) * 0.05, dtype)
    # realistic offsets: small (zero-init conv + training drift)
    off = jnp.asarray(rng.randn(b, h, w, g * 2 * kk) * 0.5, dtype)
    msk = jax.nn.sigmoid(jnp.asarray(rng.randn(b, h, w, g * kk), dtype))

    dcn = jax.jit(lambda x, wgt, off, msk: deform_conv2d(
        x, wgt, off, msk, stride=1, padding=dilation, dilation=dilation,
        deformable_groups=g))
    t_fwd = _time_chained(dcn, (x, wgt, off, msk), steps)

    def loss(x, wgt, off, msk):
        return jnp.sum(deform_conv2d(
            x, wgt, off, msk, stride=1, padding=dilation, dilation=dilation,
            deformable_groups=g).astype(jnp.float32))

    grad = jax.jit(jax.grad(loss, argnums=(1, 2, 3)))
    t_bwd = _time_chained(grad, (x, wgt, off, msk), steps)
    # full training basis: input gradients included (what trident-deform
    # actually needs — the XLA grad_x is a scatter-add col2im and
    # dominates)
    grad_all = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    t_bwd_all = _time_chained(grad_all, (x, wgt, off, msk), steps)

    conv = jax.jit(lambda x, wgt: jax.lax.conv_general_dilated(
        x, wgt, (1, 1), [(dilation, dilation)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    t_conv = _time_chained(conv, (x, wgt), steps)

    # fused Pallas forward (ops/pallas_dcn.py): sampling + mask + GEMM in
    # one VMEM-resident program — the im2col tensor never reaches HBM
    t_pallas = None
    try:
        from rrnet_tpu.ops.pallas_dcn import deform_conv2d_pallas
        pdcn = jax.jit(lambda x, wgt, off, msk: deform_conv2d_pallas(
            x, wgt, off.astype(jnp.float32), msk.astype(jnp.float32),
            stride=1, padding=dilation, dilation=dilation,
            deformable_groups=g))
        t_pallas = _time_chained(pdcn, (x, wgt, off, msk), steps)
    except Exception as e:  # pragma: no cover - kernel may not fit a shape
        print(f"# pallas skipped for {name}: {type(e).__name__}: "
              f"{str(e)[:200]}", file=sys.stderr)

    # fused custom-vjp train step: Pallas forward + fused Pallas backward
    # (transposed tent-matmul program) when bwd_fits_vmem, else XLA bwd
    t_fused_train = None
    try:
        from rrnet_tpu.ops.pallas_dcn import bwd_fits_vmem, deform_conv2d_fused
        if bwd_fits_vmem(x.shape, wgt.shape, padding=dilation,
                         dilation=dilation, deformable_groups=g,
                         dtype=dtype):
            def loss_fused(x, wgt, off, msk):
                return jnp.sum(deform_conv2d_fused(
                    x, wgt, off.astype(jnp.float32), msk.astype(jnp.float32),
                    None, 1, dilation, dilation, g).astype(jnp.float32))

            grad_fused = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))
            t_fused_train = _time_chained(grad_fused, (x, wgt, off, msk),
                                          steps)
    except Exception as e:  # pragma: no cover
        print(f"# fused bwd skipped for {name}: {type(e).__name__}: "
              f"{str(e)[:200]}", file=sys.stderr)

    flops = 2 * b * h * w * kk * c * c
    extra = {}
    if t_pallas is not None:
        extra = {
            "pallas_fwd_ms": round(t_pallas * 1e3, 2),
            "pallas_vs_xla": round(t_fwd / max(t_pallas, 1e-9), 2),
            "pallas_fwd_tflops": round(flops / t_pallas / 1e12, 1),
        }
    if t_fused_train is not None:
        extra["pallas_fwd_bwd_ms"] = round(t_fused_train * 1e3, 2)
        extra["pallas_fwd_bwd_vs_xla"] = round(
            t_bwd_all / max(t_fused_train, 1e-9), 2)
    return {
        **extra,
        "case": name,
        "shape": [b, h, w, c],
        "deformable_groups": g,
        "dilation": dilation,
        "dtype": dtype_name,
        "fwd_ms": round(t_fwd * 1e3, 2),
        "fwd_bwd_ms": round(t_bwd * 1e3, 2),
        "fwd_bwd_all_ms": round(t_bwd_all * 1e3, 2),
        "plain_conv_ms": round(t_conv * 1e3, 2),
        "fwd_vs_conv": round(t_fwd / max(t_conv, 1e-9), 1),
        "fwd_tflops": round(flops / t_fwd / 1e12, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="DCN_BENCH.json")
    args = ap.parse_args()

    import jax
    from rrnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    # Trident C4 shapes: 512^2 train crop -> 32x32 @ stride 16;
    # VisDrone val 768x1408 -> 48x88. mid channels 256, groups 4.
    cases = [
        ("train_512", 4, 32, 32, 256, 4, 1),
        ("eval_768x1408_d1", 1, 48, 88, 256, 4, 1),
        ("eval_768x1408_d3", 1, 48, 88, 256, 4, 3),
        ("g1_512", 4, 32, 32, 256, 1, 1),
    ]
    results = {"device": str(jax.devices()[0]), "cases": []}
    for name, b, h, w, c, g, d in cases:
        r = bench_case(name, b, h, w, c, g, d, args.steps, "bf16")
        results["cases"].append(r)
        print(json.dumps(r))

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
