"""AP evaluator tests with hand-built prediction/GT pairs."""

import numpy as np
import pytest

from rrnet_tpu.evallib.metrics import APAccumulator, evaluate_once, THRESHOLDS


def gt_row(x, y, w, h, cls):
    return [x, y, w, h, 1, cls, 0, 0]


def pred_row(x, y, w, h, score, cls):
    return [x, y, w, h, score, cls]


def test_perfect_prediction_ap1():
    target = np.array([gt_row(10, 10, 20, 20, 1),
                       gt_row(50, 50, 30, 30, 2)], float)
    pred = np.array([pred_row(10, 10, 20, 20, 0.9, 1),
                     pred_row(50, 50, 30, 30, 0.8, 2)], float)
    out = evaluate_once(pred, target)
    assert out["ap"] == pytest.approx(1.0)
    assert out["ar"] == pytest.approx(1.0)


def test_miss_gives_zero():
    target = np.array([gt_row(10, 10, 20, 20, 1)], float)
    pred = np.array([pred_row(200, 200, 20, 20, 0.9, 1)], float)
    out = evaluate_once(pred, target)
    assert out["ap"] == pytest.approx(0.0)


def test_wrong_class_no_credit():
    target = np.array([gt_row(10, 10, 20, 20, 1)], float)
    pred = np.array([pred_row(10, 10, 20, 20, 0.9, 2)], float)
    out = evaluate_once(pred, target)
    assert out["ap"] == pytest.approx(0.0)


def test_iou_threshold_partitions():
    """A prediction with IoU ~0.6 counts at thresholds .5/.55/.6 only."""
    target = np.array([gt_row(0, 0, 100, 100, 1)], float)
    # shifted box: overlap 75x100 of union 125x100 => iou = 0.6
    pred = np.array([pred_row(25, 0, 100, 100, 0.9, 1)], float)
    out = evaluate_once(pred, target)
    iou = 7500 / 12500
    expected_hits = (THRESHOLDS <= iou).sum()
    assert out["ap"] == pytest.approx(expected_hits / len(THRESHOLDS))


def test_ignore_region_protocol():
    """GT and predictions inside ignore regions are dropped."""
    target = np.array([
        gt_row(0, 0, 100, 100, 0),      # ignore region
        gt_row(10, 10, 20, 20, 1),      # inside ignore -> dropped
        gt_row(200, 200, 20, 20, 1),    # normal GT
    ], float)
    pred = np.array([
        pred_row(10, 10, 20, 20, 0.95, 1),   # inside ignore -> dropped
        pred_row(200, 200, 20, 20, 0.9, 1),  # matches the live GT
    ], float)
    out = evaluate_once(pred, target)
    assert out["ap"] == pytest.approx(1.0)


def test_duplicate_detections_penalized():
    target = np.array([gt_row(10, 10, 20, 20, 1)], float)
    pred = np.array([pred_row(10, 10, 20, 20, 0.9, 1),
                     pred_row(10, 10, 20, 20, 0.8, 1)], float)
    out = evaluate_once(pred, target)
    # second det is a FP at every threshold, but max recall reached at
    # rank 1 with precision 1 -> interpolated AP stays 1, AR stays 1
    assert out["ap"] == pytest.approx(1.0)
    # now invert scores: FP comes first -> precision at the TP is 0.5
    pred2 = np.array([pred_row(300, 300, 5, 5, 0.95, 1),
                      pred_row(10, 10, 20, 20, 0.9, 1)], float)
    out2 = evaluate_once(pred2, target)
    assert out2["ap"] == pytest.approx(0.5)


def test_class_in_image_weighting():
    """AP is weighted by per-class image counts (metrics.py:167-173):
    a class present in 2 images weighs twice a class in 1."""
    acc = APAccumulator()
    # class 1 perfect in two images
    t1 = np.array([gt_row(0, 0, 10, 10, 1)], float)
    p1 = np.array([pred_row(0, 0, 10, 10, 0.9, 1)], float)
    acc.add_image(p1, t1)
    acc.add_image(p1, t1)
    # class 2 completely missed in one image
    t2 = np.array([gt_row(0, 0, 10, 10, 2)], float)
    acc.add_image(np.zeros((0, 6)), t2)
    out = acc.compute()
    # weighted: (1*2 + 0*1) / 3
    assert out["ap"] == pytest.approx(2 / 3)


def test_streaming_matches_file_mode(tmp_path):
    """evaluate_results over files == accumulating in memory."""
    from rrnet_tpu.evallib.writer import save_result
    from rrnet_tpu.evallib.metrics import evaluate_results

    rng = np.random.RandomState(0)
    pred_dir = tmp_path / "pred"
    gt_dir = tmp_path / "gt"
    pred_dir.mkdir()
    gt_dir.mkdir()
    acc = APAccumulator()
    for i in range(4):
        n = 10
        gt = np.concatenate([rng.rand(n, 2) * 200,
                             rng.rand(n, 2) * 40 + 10,
                             np.ones((n, 1)),
                             rng.randint(1, 4, (n, 1)).astype(float),
                             np.zeros((n, 2))], axis=1)
        jitter = rng.randn(n, 4) * 2
        pred = np.concatenate([gt[:, :4] + jitter,
                               rng.rand(n, 1),
                               gt[:, 5:6]], axis=1)
        # write files (float style) and accumulate exactly what the file
        # mode will read back (the %.4f score / %f coord formatting is
        # part of the reference pipeline's behavior)
        save_result(str(pred_dir / f"img{i}.txt"), pred)
        np.savetxt(str(gt_dir / f"img{i}.txt"), gt, fmt="%.0f", delimiter=",")
        from rrnet_tpu.evallib.metrics import _int_truncate_xywh
        from rrnet_tpu.evallib.writer import load_result
        loaded = load_result(str(pred_dir / f"img{i}.txt"))
        loaded_gt = load_result(str(gt_dir / f"img{i}.txt"))
        acc.add_image(_int_truncate_xywh(loaded), loaded_gt)
    file_out = evaluate_results(str(pred_dir), str(gt_dir), verbose=False)
    mem_out = acc.compute()
    assert file_out["ap"] == pytest.approx(mem_out["ap"], abs=1e-9)
