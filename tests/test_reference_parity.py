"""Parity tests against the ACTUAL reference implementation at
/root/reference (read-only import; its CUDA/Cython ext module is shimmed
with our native host NMS so the pure-Python code paths run unmodified).

These pin the contract that defines the headline numbers: identical
prediction/GT inputs must produce identical AP through the reference's
`utils/metrics/metrics.py` and our `evallib.metrics`.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_metrics():
    """Import the reference metrics module with ext.nms shimmed."""
    from rrnet_tpu.evallib import host_nms

    def soft_nms_shim(dets, sigma=0.5, Nt=0.3, threshold=0.001, method=0):
        out = host_nms.soft_nms(np.asarray(dets, np.float32), sigma=sigma,
                                Nt=Nt, threshold=threshold, method=method)
        return out

    def nms_shim(dets, thresh, force_cpu=False, gpu_id=None):
        keep = host_nms.hard_nms_indices(np.asarray(dets, np.float32),
                                         thresh, plus_one=True,
                                         suppress_equal=True)
        return list(keep)

    wrapper = types.ModuleType("ext.nms.nms_wrapper")
    wrapper.soft_nms = soft_nms_shim
    wrapper.nms = nms_shim
    ext = types.ModuleType("ext")
    ext_nms = types.ModuleType("ext.nms")
    sys.modules.setdefault("ext", ext)
    sys.modules.setdefault("ext.nms", ext_nms)
    sys.modules["ext.nms.nms_wrapper"] = wrapper

    sys.path.insert(0, REFERENCE)
    try:
        import importlib
        mod = importlib.import_module("utils.metrics.metrics")
    finally:
        sys.path.remove(REFERENCE)
    return mod


def synthetic_case(seed, n_gt=40, n_pred=60, with_ignore=True):
    rng = np.random.RandomState(seed)
    gt = np.concatenate([
        rng.rand(n_gt, 2) * 400,
        rng.rand(n_gt, 2) * 60 + 8,
        np.ones((n_gt, 1)),
        rng.randint(1, 11, (n_gt, 1)).astype(float),
        np.zeros((n_gt, 2)),
    ], axis=1)
    if with_ignore:
        gt[0, 5] = 0  # one ignore region
        gt[0, 2:4] = (120, 120)
    # predictions: jittered GT + noise boxes
    base = gt[rng.randint(0, n_gt, n_pred)]
    pred = base.copy()
    pred[:, :4] += rng.randn(n_pred, 4) * rng.choice([1, 6], n_pred)[:, None]
    pred[:, 2:4] = np.abs(pred[:, 2:4]) + 1
    pred[:, :2] = np.abs(pred[:, :2])
    scores = rng.rand(n_pred)
    pred = np.concatenate([pred[:, :4], scores[:, None], pred[:, 5:6]], 1)
    return pred.astype(np.float64), gt.astype(np.float64)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ap_evaluator_matches_reference(ref_metrics, seed):
    from rrnet_tpu.evallib.metrics import APAccumulator

    pred, gt = synthetic_case(seed)

    # ours
    acc = APAccumulator()
    acc.add_image(pred, gt)
    ours = acc.compute()

    # reference
    cls_num, k = 11, 10
    flags = [torch.zeros(0, k) for _ in range(cls_num - 1)]
    confs = [torch.zeros(0) for _ in range(cls_num - 1)]
    tc = torch.zeros(cls_num - 1)
    ic = torch.zeros(cls_num - 1)
    flags, confs, tc, ic = ref_metrics.get_tp(
        torch.from_numpy(pred).float(), torch.from_numpy(gt).float(),
        flags, confs, tc, ic)
    ap, rc = ref_metrics.calculate_ap_rc(flags, confs, tc, ic)

    np.testing.assert_allclose(ours["ap"], float(ap.mean()), atol=1e-5)
    np.testing.assert_allclose(ours["ap50"], float(ap[0]), atol=1e-5)
    np.testing.assert_allclose(ours["ap75"], float(ap[5]), atol=1e-5)
    np.testing.assert_allclose(ours["ar"], float(rc), atol=1e-5)


def test_multi_image_accumulation_matches_reference(ref_metrics):
    from rrnet_tpu.evallib.metrics import APAccumulator

    torch_flags = [torch.zeros(0, 10) for _ in range(10)]
    torch_confs = [torch.zeros(0) for _ in range(10)]
    tc = torch.zeros(10)
    ic = torch.zeros(10)
    acc = APAccumulator()
    for seed in range(5):
        pred, gt = synthetic_case(seed + 100, n_gt=25, n_pred=35)
        acc.add_image(pred, gt)
        torch_flags, torch_confs, tc, ic = ref_metrics.get_tp(
            torch.from_numpy(pred).float(), torch.from_numpy(gt).float(),
            torch_flags, torch_confs, tc, ic)
    ap, rc = ref_metrics.calculate_ap_rc(torch_flags, torch_confs, tc, ic)
    ours = acc.compute()
    np.testing.assert_allclose(ours["ap"], float(ap.mean()), atol=1e-5)
    np.testing.assert_allclose(ours["ar"], float(rc), atol=1e-5)


def test_gaussian_targets_match_reference_torch(ref_metrics):
    """Our device renderer vs the reference's torch to_heatmap on the
    same annotations. (torchvision isn't in this image — the reference
    module only uses it for to_tensor/normalize, so a stub suffices.)"""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvf = types.ModuleType("torchvision.transforms.functional")
        tvf.to_tensor = lambda x: x
        tvf.normalize = lambda x, mean, std: x
        tvt.Compose = lambda fns: (lambda x: x)
        tv.transforms = tvt
        tvt.functional = tvf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.transforms.functional"] = tvf
    sys.path.insert(0, REFERENCE)
    try:
        import importlib
        func = importlib.import_module("datasets.transforms.functional")
    finally:
        sys.path.remove(REFERENCE)

    import jax.numpy as jnp
    from rrnet_tpu.ops.targets import render_centernet_targets

    rng = np.random.RandomState(3)
    n = 10
    annos = np.concatenate([
        rng.rand(n, 2) * 96, rng.rand(n, 2) * 30 + 4,
        np.ones((n, 1)), rng.randint(1, 11, (n, 1)).astype(float),
        np.zeros((n, 2))], 1).astype(np.float32)

    img = torch.zeros(3, 128, 128)
    t_img, t_annos, hm, wh, ind, offset, reg_mask = func.to_heatmap(
        (img, torch.from_numpy(annos)), scale_factor=4, cls_num=10)

    ours = render_centernet_targets(jnp.asarray(annos),
                                    jnp.ones(n, bool), feat_shape=(32, 32),
                                    scale_factor=4, num_classes=10)
    # reference hm is (C, H, W); ours (H, W, C)
    np.testing.assert_allclose(np.asarray(ours.hm).transpose(2, 0, 1),
                               hm.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.wh), wh.numpy(), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ours.ind),
                                  ind.numpy().astype(np.int64).ravel())
    np.testing.assert_allclose(np.asarray(ours.offset), offset.numpy(),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ours.reg_mask),
                                  reg_mask.numpy().astype(np.float32).ravel())
