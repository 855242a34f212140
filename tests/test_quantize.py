"""int8 post-training quantization: Conv2d drop-in parity, calibration,
and quantized-vs-bf16 eval agreement (CPU; the speedup itself is a TPU
property measured in INT8_BENCH.json)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from rrnet_tpu import config as cfglib
from rrnet_tpu.evallib.infer import Evaluator
from rrnet_tpu.models import build_model
from rrnet_tpu.models.layers import (Conv2d, current_quant, quant_context,
                                     quant_scales_from_stats)


def test_conv2d_matches_nn_conv_bit_exact():
    """Outside a quant context Conv2d must compute exactly nn.Conv
    (params share names/shapes, so one init serves both)."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 40))
    for use_bias in (True, False):
        for dtype in (None, jnp.bfloat16):
            for stride, pad in (((1, 1), "SAME"), ((2, 2), [(1, 1), (1, 1)])):
                ref = nn.Conv(24, (3, 3), strides=stride, padding=pad,
                              use_bias=use_bias, dtype=dtype)
                new = Conv2d(24, (3, 3), strides=stride, padding=pad,
                             use_bias=use_bias, dtype=dtype)
                v = ref.init(rng, x)
                yr, yn = ref.apply(v, x), new.apply(v, x)
                assert yr.dtype == yn.dtype
                np.testing.assert_array_equal(
                    np.asarray(yr, np.float32), np.asarray(yn, np.float32))


def test_conv2d_grouped_matches_nn_conv():
    """Grouped / depthwise Conv2d (ShuffleNet blocks) must equal nn.Conv
    with the same feature_group_count — and stay exempt from int8 (too
    little arithmetic per byte to pay for the requant pass)."""
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (2, 12, 12, 48))
    for groups in (4, 48):  # grouped and fully depthwise
        ref = nn.Conv(48, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                      feature_group_count=groups)
        new = Conv2d(48, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                     feature_group_count=groups)
        v = ref.init(rng, x)
        np.testing.assert_array_equal(np.asarray(ref.apply(v, x)),
                                      np.asarray(new.apply(v, x)))
        with quant_context("calibrate"):
            _, st = new.apply(v, x, mutable=["quant_stats"])
        assert quant_scales_from_stats(
            jax.device_get(st.get("quant_stats", {}))) == {}
        with quant_context("int8", {"": 1.0}):
            y_q = np.asarray(new.apply(v, x))
        np.testing.assert_array_equal(np.asarray(ref.apply(v, x)), y_q)


def test_quant_context_scoping():
    assert current_quant() is None
    with quant_context("calibrate"):
        assert current_quant().mode == "calibrate"
        with quant_context("int8", {}):
            assert current_quant().mode == "int8"
        assert current_quant().mode == "calibrate"
    assert current_quant() is None
    with pytest.raises(ValueError):
        with quant_context("fp4"):
            pass


class _TwoConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv2d(64, (3, 3), use_bias=False, name="c1")(x))
        return Conv2d(64, (3, 3), use_bias=False, name="c2")(x)


def test_calibrate_then_int8_close():
    rng = jax.random.PRNGKey(1)
    net = _TwoConv()
    x = jax.random.normal(rng, (2, 16, 16, 64)) * 0.5
    v = net.init(rng, x)
    with quant_context("calibrate"):
        _, st = net.apply(v, x, mutable=["quant_stats"])
    scales = quant_scales_from_stats(jax.device_get(st["quant_stats"]))
    assert set(scales) == {"c1", "c2"} and all(s > 0 for s in scales.values())
    y_ref = np.asarray(net.apply(v, x))
    with quant_context("int8", scales):
        y_q = np.asarray(net.apply(v, x))
    rel = np.abs(y_q - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    assert rel < 0.05, rel


def test_thin_input_convs_exempt():
    """Convs with < min_channels input (stem, 3-channel) never quantize
    or calibrate."""
    rng = jax.random.PRNGKey(2)
    conv = Conv2d(16, (3, 3), use_bias=False)
    x = jax.random.normal(rng, (1, 8, 8, 3))
    v = conv.init(rng, x)
    with quant_context("calibrate"):
        _, st = conv.apply(v, x, mutable=["quant_stats"])
    assert quant_scales_from_stats(jax.device_get(st.get("quant_stats", {}))) == {}
    y_ref = np.asarray(conv.apply(v, x))
    with quant_context("int8", {"": 1.0}):
        y_q = np.asarray(conv.apply(v, x))
    np.testing.assert_array_equal(y_ref, y_q)


def test_train_path_untouched():
    """No quant context -> int8 never engages, even with scales floating
    around from an earlier block (regression against context leaks)."""
    rng = jax.random.PRNGKey(3)
    net = _TwoConv()
    x = jax.random.normal(rng, (1, 8, 8, 64))
    v = net.init(rng, x)
    with quant_context("int8", {"c1": 1.0, "c2": 1.0}):
        pass  # exited before any trace
    y1 = np.asarray(net.apply(v, x))
    y2 = np.asarray(net.apply(v, x))
    np.testing.assert_array_equal(y1, y2)


@pytest.mark.slow
def test_int8_evaluator_matches_bf16_detections():
    """Evaluator(quantize='int8') on overfit weights: auto-calibrates on
    the first batch and yields the same confident detections as the
    bf16 evaluator (same count of high-score boxes, matching classes,
    boxes within ~2px)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from overfit_fixture import overfit_tiny_centernet

    variables, imgs = overfit_tiny_centernet()
    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
    cfg = cfglib.set_by_path(cfg, "val.scales", (1.0,))
    cfg = cfglib.set_by_path(cfg, "val.flip_tta", False)
    model = build_model(cfg)

    ev = Evaluator(cfg, variables, model=model, bucket_multiple=64,
                   decode_topk=20)
    ev8 = Evaluator(cfg, variables, model=model, bucket_multiple=64,
                    decode_topk=20, quantize="int8")
    preds = ev.predict_batch(imgs[:4])
    preds8 = ev8.predict_batch(imgs[:4])
    assert ev8._quant_scales and len(ev8._quant_scales) >= 8

    for p, p8 in zip(preds, preds8):
        strong = p[p[:, 4] > 0.3]
        strong8 = p8[p8[:, 4] > 0.3]
        assert len(strong8) == len(strong) > 0
        # greedy-match by center distance: every strong bf16 detection
        # has an int8 counterpart with same class, close box and score
        used = set()
        for row in strong:
            c = row[:2] + row[2:4] / 2
            d = np.linalg.norm(strong8[:, :2] + strong8[:, 2:4] / 2 - c,
                               axis=1)
            j = int(np.argmin(d))
            assert d[j] < 3.0 and j not in used
            used.add(j)
            assert strong8[j, 5] == row[5]
            assert abs(strong8[j, 4] - row[4]) < 0.1
            np.testing.assert_allclose(strong8[j, :4], row[:4], atol=3.0)


@pytest.mark.slow
def test_int8_recalibrates_after_weight_swap():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from overfit_fixture import overfit_tiny_centernet

    variables, imgs = overfit_tiny_centernet()
    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
    cfg = cfglib.set_by_path(cfg, "val.scales", (1.0,))
    cfg = cfglib.set_by_path(cfg, "val.flip_tta", False)
    ev8 = Evaluator(cfg, variables, bucket_multiple=64, decode_topk=20,
                    quantize="int8")
    ev8.predict(imgs[0])
    assert ev8._quant_scales is not None
    ev8.update_variables(variables)
    assert ev8._quant_scales is None and len(ev8._compiled) == 0
    ev8.predict(imgs[0])  # recalibrates lazily
    assert ev8._quant_scales is not None
