"""Multi-checkpoint auto-eval sweep: Evaluator.update_variables must
swap weights for real (dropping the compiled-program cache — BN
constants are baked into compiled programs) so one Evaluator can score
a whole checkpoint directory (the reference's auto_eval loop,
scripts/RRNet/auto_eval.py:11-33)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rrnet_tpu import config as cfglib
from rrnet_tpu.evallib.infer import Evaluator
from rrnet_tpu.evallib.metrics import APAccumulator
from rrnet_tpu.models import build_model
from rrnet_tpu.train import Trainer
from rrnet_tpu.utils import checkpoint as ckpt

from overfit_fixture import blob_batch

pytestmark = pytest.mark.slow


def _ap_for(ev, imgs, annos):
    acc = APAccumulator(11)
    preds = ev.predict_batch(imgs)
    for pred, gt in zip(preds, annos):
        acc.add_image(np.asarray(pred), gt)
    return acc.compute()["ap"]


def test_checkpoint_sweep_via_update_variables(tmp_path):
    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
    cfg = cfglib.set_by_path(cfg, "train.crop_size", (64, 64))
    cfg = cfglib.set_by_path(cfg, "train.max_objects", 8)
    cfg = cfglib.set_by_path(cfg, "val.scales", (1.0,))
    cfg = cfglib.set_by_path(cfg, "val.flip_tta", False)

    trainer = Trainer(cfg)
    state = trainer.init_state()
    images, annos, valid = blob_batch()
    mean = np.asarray(cfg.train.mean, np.float32)
    std = np.asarray(cfg.train.std, np.float32)
    batch = trainer.shard({
        "images": jnp.asarray((images - mean) / std),
        "annos": jnp.asarray(annos), "valid": jnp.asarray(valid)})
    for _ in range(6):
        state, _ = trainer.train_step(state, batch)
    ckpt.save_checkpoint(str(tmp_path), state)
    for _ in range(34):
        state, _ = trainer.train_step(state, batch)
    ckpt.save_checkpoint(str(tmp_path), state)

    steps = ckpt.available_steps(str(tmp_path))
    assert steps == [6, 40]

    imgs = [(im * 255).clip(0, 255).astype(np.uint8) for im in images]
    gts = [a[v] for a, v in zip(annos, valid)]

    # ONE evaluator swept over both checkpoints, like auto_eval.py
    model = build_model(cfg)
    template = trainer.init_state()
    aps = {}
    ev = None
    for step in steps:
        restored = ckpt.restore_checkpoint(str(tmp_path), template,
                                           step=step)
        variables = {"params": restored.params,
                     "batch_stats": restored.batch_stats}
        if ev is None:
            ev = Evaluator(cfg, variables, model=model, bucket_multiple=64,
                           decode_topk=20)
        else:
            n_cached = len(ev._compiled)
            assert n_cached > 0
            ev.update_variables(variables)
            # compiled programs hold baked-in BN stats -> must be dropped
            assert len(ev._compiled) == 0
        aps[step] = _ap_for(ev, imgs, gts)

    # the longer-trained checkpoint must genuinely win (weights swapped,
    # not stale programs re-used)
    assert aps[40] > aps[6] + 0.05, aps
    assert aps[40] > 0.3, aps
