import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rrnet_tpu import config as cfglib
from rrnet_tpu.models import build_model

pytestmark = pytest.mark.slow


def init_and_run(model, x, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    if train:
        out, _ = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
        return out
    return model.apply(variables, x, train=False)


def test_centernet_hourglass_shapes():
    cfg = cfglib.centernet_config()
    model = build_model(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    hms, whs, regs = model.apply(variables, x, train=False)
    assert len(hms) == 2
    assert hms[0].shape == (1, 32, 32, 10)
    assert whs[0].shape == (1, 32, 32, 2)
    assert regs[0].shape == (1, 32, 32, 2)
    # heatmap head bias init -2.19 (detectors/centernet_detector.py:17-19)
    bias = np.asarray(variables["params"]["hm"]["out0"]["bias"])
    np.testing.assert_allclose(bias, -2.19, atol=1e-6)


def test_rrnet_forward_outputs():
    cfg = cfglib.rrnet_config()
    cfg = cfglib.set_by_path(cfg, "model.topk", 64)
    cfg = cfglib.set_by_path(cfg, "model.stage2_rois", 16)
    model = build_model(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    out = init_and_run(model, x)
    assert out.stage2_reg.shape == (1, 16, 4)
    assert out.rois.shape == (1, 16, 4)
    assert out.roi_valid.shape == (1, 16)
    assert out.hms[0].shape == (1, 32, 32, 10)


def test_rrnet_soft_nms_variant():
    cfg = cfglib.rrnet_config()
    cfg = cfglib.set_by_path(cfg, "model.topk", 32)
    cfg = cfglib.set_by_path(cfg, "model.stage2_rois", 8)
    cfg = cfglib.set_by_path(cfg, "model.nms_type_for_stage1", "soft_nms")
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    out = init_and_run(model, x)
    assert out.stage2_reg.shape == (1, 8, 4)


def test_retinanet_shapes():
    cfg = cfglib.retinanet_config()
    model = build_model(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    loc, cls = init_and_run(model, x)
    # levels 3/4/5 on 128 -> 16,8,4 => (256+64+16)*9 = 3024 anchors
    assert loc.shape == (1, 3024, 4)
    assert cls.shape == (1, 3024, 10)


def test_resnet_feature_shapes():
    from rrnet_tpu.models.backbones import get_backbone
    bb = get_backbone("resnet50")
    x = jnp.zeros((1, 64, 64, 3))
    variables = bb.init(jax.random.PRNGKey(0), x, train=False)
    l1, l2, l3, l4 = bb.apply(variables, x, train=False)
    assert l1.shape == (1, 16, 16, 256)
    assert l2.shape == (1, 8, 8, 512)
    assert l3.shape == (1, 4, 4, 1024)
    assert l4.shape == (1, 2, 2, 2048)


def test_centernet_train_mode_updates_batch_stats():
    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "resnet10")
    # resnet10 returns 4 maps; centernet indexes stacks — use hourglass
    cfg = cfglib.set_by_path(cfg, "model.backbone", "hourglass")
    model = build_model(cfg)
    x = jnp.ones((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    assert "batch_stats" in mutated


@pytest.mark.parametrize("name,n_feats", [
    ("shufflenet_1.0x", 3),
    ("hrnetv2", 4),
])
def test_other_backbones(name, n_feats):
    from rrnet_tpu.models.backbones import get_backbone
    bb = get_backbone(name)
    x = jnp.zeros((1, 64, 64, 3))
    variables = bb.init(jax.random.PRNGKey(0), x, train=False)
    outs = bb.apply(variables, x, train=False)
    assert len(outs) == n_feats


def test_hrnet_pose_single_output():
    from rrnet_tpu.models.backbones import get_backbone
    bb = get_backbone("hrnet32")
    x = jnp.zeros((1, 64, 64, 3))
    variables = bb.init(jax.random.PRNGKey(0), x, train=False)
    outs = bb.apply(variables, x, train=False)
    assert len(outs) == 1
    assert outs[0].shape == (1, 16, 16, 32)


def test_rrnet_hrnetv2_attention_preset():
    """The 'rrnet_hrnetv2_attention' configuration: HRNetV2 backbone
    (first two branches drive the two 'stacks') + windowed self-attention
    with zero-init projection (initial forward == no-attention forward)."""
    cfg = cfglib.PRESETS["rrnet_hrnetv2_attention"]()
    cfg = cfglib.set_by_path(cfg, "model.topk", 32)
    cfg = cfglib.set_by_path(cfg, "model.stage2_rois", 8)
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    names = str(jax.tree_util.tree_structure(variables["params"]))
    assert "attention0" in names and "attention1" in names
    out = model.apply(variables, x, train=False)
    assert out.stage2_reg.shape == (1, 8, 4)


def test_stem_conv_s2d_matches_plain_conv():
    """The space-to-depth stem (layers._StemConv) must be bit-equivalent
    (up to f32 summation order) to the plain 7x7 stride-2 conv, for even
    AND odd spatial sizes, and share nn.Conv's param layout."""
    from flax import linen as nn

    from rrnet_tpu.models.layers import _StemConv, torch_conv_init

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 96, 3),
                    jnp.float32)
    ref = nn.Conv(16, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                  use_bias=False, kernel_init=torch_conv_init)
    v = ref.init(rng, x)
    stem = _StemConv(16, kernel_init=torch_conv_init)
    sv = stem.init(rng, x)
    assert (jax.tree.map(jnp.shape, sv["params"])
            == jax.tree.map(jnp.shape, v["params"]))
    for xi in (x, jnp.asarray(np.random.RandomState(1).randn(1, 63, 95, 3),
                              jnp.float32)):
        y = stem.apply({"params": {"kernel": v["params"]["kernel"]}}, xi)
        y_ref = ref.apply(v, xi)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-5)
