import pytest

from rrnet_tpu import config as cfglib


def test_presets_exist():
    for name in ("rrnet", "centernet", "retinanet",
                 "rrnet_hrnetv2_attention"):
        cfg = cfglib.PRESETS[name]()
        assert cfg.seed == 219
        assert cfg.num_classes == 10


def test_reference_defaults():
    """The reference config values (configs/rrnet_config.py)."""
    cfg = cfglib.rrnet_config()
    assert cfg.train.lr == 2.5e-4
    assert cfg.train.lr_milestones == (60000, 80000)
    assert cfg.train.iter_num == 100000
    assert cfg.train.crop_size == (512, 512)
    assert cfg.train.scale_factor == 4
    assert cfg.model.num_stacks == 2
    assert cfg.model.nms_type_for_stage1 == "nms"
    assert cfg.model.nms_per_class_for_stage1 is True
    assert cfg.val.scales == (1.0, 1.1, 1.2, 1.3, 1.4, 1.5)
    assert cfg.val.auto_test is True
    assert cfg.model.soft_nms.iou_threshold == 0.7
    assert cfg.model.soft_nms.score_threshold == 0.1


def test_set_by_path_nested():
    cfg = cfglib.rrnet_config()
    out = cfglib.set_by_path(cfg, "train.lr", 1e-3)
    assert out.train.lr == 1e-3
    assert cfg.train.lr == 2.5e-4   # original untouched
    out2 = cfglib.set_by_path(cfg, "model.soft_nms.sigma", 0.7)
    assert out2.model.soft_nms.sigma == 0.7


def test_set_by_path_unknown_raises():
    cfg = cfglib.rrnet_config()
    with pytest.raises(AttributeError):
        cfglib.set_by_path(cfg, "train.nonexistent", 1)


def test_apply_overrides_literals():
    cfg = cfglib.rrnet_config()
    cfg = cfglib.apply_overrides(cfg, [
        "train.lr=0.001",
        "model.backbone=hrnetv2",
        "val.scales=(1.0,)",
        "train.with_road=False",
    ])
    assert cfg.train.lr == 0.001
    assert cfg.model.backbone == "hrnetv2"
    assert cfg.val.scales == (1.0,)
    assert cfg.train.with_road is False


def test_int_coercion():
    cfg = cfglib.rrnet_config()
    out = cfglib.apply_overrides(cfg, ["model.topk=500"])
    assert out.model.topk == 500 and isinstance(out.model.topk, int)


def test_centernet_vs_rrnet_sync_bn():
    """RRNet converts to SyncBN, CenterNet does not (SURVEY §2.3)."""
    assert cfglib.rrnet_config().model.sync_bn is True
    assert cfglib.centernet_config().model.sync_bn is False
    assert cfglib.centernet_config().val.flip_tta is True
