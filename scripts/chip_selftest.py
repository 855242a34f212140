#!/usr/bin/env python
"""On-chip kernel self-test -> CHIP_SELFTEST.json.

The pytest suite runs on the CPU x8 platform (tests/conftest.py), so the
Pallas kernels are only exercised there in `interpret=True` mode —
which validates the math but NOT the Mosaic lowering (tiling, dtype
casts, scratch/SMEM semantics, grid accumulation). This script reruns
the kernel oracle checks ON THE REAL TPU and commits the observed
errors as an artifact, so "the kernels are correct on hardware" is a
rerunnable claim rather than an ad-hoc session log.

Mirrors the reference's own extension test protocol (`ext/dcn/test.py`:
zero-offset identity + gradcheck; `ext/nms/nms_wrapper.py` __main__
keep-set probes), widened to every Pallas program we ship.

Usage: python scripts/chip_selftest.py [--out CHIP_SELFTEST.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / max(1e-6, float(np.max(np.abs(b)))))


def dcn_forward_cases(results):
    import jax.numpy as jnp

    from rrnet_tpu.ops.dcn import deform_conv2d
    from rrnet_tpu.ops.pallas_dcn import deform_conv2d_pallas, fits_vmem

    # f32 tolerance: MXU DEFAULT precision = bf16 multiplies for f32
    # operands (see the backward-case note below); CPU interpret tests
    # pin the exact math at 2e-4
    cases = [
        ("train_512_g4_bf16", 2, 32, 32, 256, 4, jnp.bfloat16, 2e-2),
        ("eval_48x88_g4_bf16", 1, 48, 88, 256, 4, jnp.bfloat16, 2e-2),
        ("small_g2_f32", 2, 16, 16, 64, 2, jnp.float32, 1e-2),
    ]
    rows = []
    for name, b, h, w, c, g, dt, tol in cases:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, h, w, c), dt)
        wt = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, dt)
        off = jnp.asarray(rng.randn(b, h, w, g * 18) * 1.5, jnp.float32)
        msk = jnp.asarray(rng.rand(b, h, w, g * 9), jnp.float32)
        assert fits_vmem(x.shape, wt.shape, deformable_groups=g, dtype=dt)
        got = deform_conv2d_pallas(x, wt, off, msk, deformable_groups=g)
        ref = deform_conv2d(x, wt, off, msk, deformable_groups=g)
        err = _rel(got, ref)
        rows.append({"case": name, "max_rel_vs_xla": round(err, 5),
                     "pass": err < tol})
    results["dcn_forward"] = rows


def dcn_backward_cases(results):
    import jax
    import jax.numpy as jnp

    from rrnet_tpu.ops.dcn import deform_conv2d
    from rrnet_tpu.ops.pallas_dcn import (bwd_fits_vmem,
                                          deform_conv2d_pallas_bwd)

    # f32 tolerance note: TPU matmuls run f32 operands through the MXU
    # at DEFAULT precision (bf16 multiplies), so the backward's longer
    # matmul chain (recompute + transposed passes) accumulates ~4e-3
    # rel vs the XLA reference — the CPU interpret-mode tests pin the
    # exact math at 5e-4 (tests/test_pallas_dcn.py)
    cases = [
        ("train_512_g4_bf16", 2, 32, 32, 256, 4, jnp.bfloat16, 3e-2),
        ("small_g2_f32", 2, 16, 16, 64, 2, jnp.float32, 1e-2),
    ]
    rows = []
    for name, b, h, w, c, g, dt, tol in cases:
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(b, h, w, c), dt)
        wt = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, dt)
        off = jnp.asarray(rng.randn(b, h, w, g * 18) * 0.5, jnp.float32)
        msk = jnp.asarray(rng.rand(b, h, w, g * 9), jnp.float32)
        ct = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
        assert bwd_fits_vmem(x.shape, wt.shape, deformable_groups=g,
                             dtype=dt), name
        got = deform_conv2d_pallas_bwd(x, wt, off, msk, ct,
                                       deformable_groups=g)

        def ref_fn(x_, w_, o_, m_):
            return deform_conv2d(x_, w_, o_, m_, None, deformable_groups=g)

        _, vjp = jax.vjp(ref_fn, x, wt, off, msk)
        refs = vjp(ct)
        errs = {n: round(_rel(a, r), 5)
                for n, a, r in zip(["gx", "gw", "goff", "gmask"], got, refs)}
        rows.append({"case": name, "max_rel_vs_xla_vjp": errs,
                     "pass": all(e < tol for e in errs.values())})
    results["dcn_backward"] = rows


def dcn_dispatch(results):
    import jax.numpy as jnp

    from rrnet_tpu.ops.dcn import deform_conv2d, deform_conv2d_auto
    from rrnet_tpu.ops.pallas_dcn import fits_vmem

    rng = np.random.RandomState(2)
    # infeasible %8 shape: must fall back to XLA and match it exactly
    x = jnp.asarray(rng.randn(1, 6, 6, 4), jnp.float32)
    wt = jnp.asarray(rng.randn(3, 3, 4, 4) * 0.1, jnp.float32)
    off = jnp.asarray(rng.randn(1, 6, 6, 18) * 0.5, jnp.float32)
    assert not fits_vmem(x.shape, wt.shape)
    a = deform_conv2d_auto(x, wt, off, None)
    r = deform_conv2d(x, wt, off, None)
    err = float(np.max(np.abs(np.asarray(a) - np.asarray(r))))
    results["dcn_auto_fallback"] = {"max_abs_vs_xla": err, "pass": err == 0.0}


def nms_cases(results):
    import jax
    import jax.numpy as jnp

    from oracles import np_soft_nms
    from rrnet_tpu.ops.nms import hard_nms
    from rrnet_tpu.ops.pallas_nms import (soft_nms_pallas,
                                          soft_nms_pallas_classes)
    from oracles import np_hard_nms

    rng = np.random.RandomState(3)
    n, ncls = 600, 10
    cxy = rng.rand(n, 2) * 500
    wh = rng.rand(n, 2) * 50 + 5
    boxes = np.concatenate([cxy, cxy + wh], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    cls = rng.randint(0, ncls, n)
    kw = dict(sigma=0.5, iou_threshold=0.7, score_threshold=0.1,
              method="gaussian")

    ns_s, keep_s, rank_s = [np.asarray(v) for v in soft_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores),
        class_ids=jnp.asarray(cls), **kw)]
    ok = True
    max_err = 0.0
    for c in range(ncls):
        m = cls == c
        order, oracle = np_soft_nms(boxes[m], scores[m], **kw)
        ok &= set(np.where(keep_s[m])[0]) == set(order)
        if keep_s[m].any():
            max_err = max(max_err, float(np.max(
                np.abs(ns_s[m][keep_s[m]] - oracle[keep_s[m]]))))
    results["soft_nms_serial_chunked"] = {
        "kept": int(keep_s.sum()), "keep_sets_match_oracle": bool(ok),
        "max_abs_kept_score_err": round(max_err, 6),
        "pass": bool(ok) and max_err < 1e-3}

    ns_c, keep_c, rank_c = [np.asarray(v) for v in soft_nms_pallas_classes(
        jnp.asarray(boxes), jnp.asarray(scores),
        class_ids=jnp.asarray(cls), num_classes=ncls, **kw)]
    same_keep = bool((keep_c == keep_s).all())
    oc = np.where(keep_c)[0][np.argsort(rank_c[keep_c])]
    os_ = np.where(keep_s)[0][np.argsort(rank_s[keep_s])]
    results["soft_nms_class_parallel"] = {
        "keep_matches_serial": same_keep,
        "order_matches_serial": bool((oc == os_).all()),
        "pass": same_keep and bool((oc == os_).all())}

    keep_h = np.asarray(hard_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                 0.7, class_ids=jnp.asarray(cls)))
    ok_h = True
    for c in range(ncls):
        m = cls == c
        keep_ref = np_hard_nms(boxes[m], scores[m], 0.7)
        ok_h &= set(np.where(keep_h[m])[0]) == set(keep_ref)
    results["hard_nms_fixpoint"] = {"keep_sets_match_oracle": bool(ok_h),
                                    "pass": bool(ok_h)}


def renderer_case(results):
    """On-chip gaussian target render vs the same program on CPU (which
    is itself bit-identical to the reference torch renderer)."""
    import jax
    import jax.numpy as jnp

    from rrnet_tpu.train import criterions

    rng = np.random.RandomState(4)
    b, nobj = 4, 32
    xy = rng.rand(b, nobj, 2) * 400
    wh = rng.rand(b, nobj, 2) * 60 + 4
    pad = np.ones((b, nobj, 1), np.float32)
    cl = rng.randint(1, 11, (b, nobj, 1)).astype(np.float32)
    annos = np.concatenate([xy, wh, pad, cl, pad, pad],
                           -1).astype(np.float32)
    valid = rng.rand(b, nobj) > 0.2

    tpu = jax.jit(lambda a, v: criterions.centernet_targets(
        a, v, (128, 128), 4, 10))(jnp.asarray(annos), jnp.asarray(valid))
    cpu_dev = jax.devices("cpu")[0]
    with jax.default_device(cpu_dev):
        cpu = jax.jit(lambda a, v: criterions.centernet_targets(
            a, v, (128, 128), 4, 10))(jnp.asarray(annos),
                                      jnp.asarray(valid))
    import jax as _jax
    errs = {}
    tpu_leaves = _jax.tree_util.tree_leaves_with_path(tpu)
    cpu_leaves = _jax.tree_util.tree_leaves(cpu)
    for (path, t_leaf), c_leaf in zip(tpu_leaves, cpu_leaves):
        k = "".join(str(p) for p in path) or "leaf"
        errs[k] = float(np.max(np.abs(np.asarray(t_leaf, np.float32)
                                      - np.asarray(c_leaf, np.float32))))
    results["target_renderer_tpu_vs_cpu"] = {
        "max_abs_err": {k: round(v, 7) for k, v in errs.items()},
        "pass": all(v < 1e-4 for v in errs.values())}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "CHIP_SELFTEST.json"))
    args = ap.parse_args()

    import jax

    from rrnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    t0 = time.time()
    results = {"device": str(jax.devices()[0]),
               "platform": jax.devices()[0].platform}
    assert results["platform"] in ("tpu",), (
        "chip selftest must run on the real TPU (got "
        f"{results['platform']}); do not set JAX_PLATFORMS=cpu")

    dcn_forward_cases(results)
    dcn_backward_cases(results)
    dcn_dispatch(results)
    nms_cases(results)
    renderer_case(results)

    results["wall_s"] = round(time.time() - t0, 1)
    results["all_pass"] = all(
        all(r["pass"] for r in v) if isinstance(v, list) else v["pass"]
        for k, v in results.items()
        if isinstance(v, (list, dict)) and k not in ())
    print(json.dumps(results, indent=1))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
