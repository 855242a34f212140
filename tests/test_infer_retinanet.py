"""RetinaNet eval path through the Evaluator (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from rrnet_tpu import config as cfglib
from rrnet_tpu.evallib.infer import Evaluator
from rrnet_tpu.models import build_model
import pytest

pytestmark = pytest.mark.slow


def test_retinanet_evaluator():
    cfg = cfglib.retinanet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "resnet10")
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    ev = Evaluator(cfg, variables, model=model, bucket_multiple=128,
                   decode_topk=64)
    img = (np.random.RandomState(0).rand(120, 110, 3) * 255).astype(np.uint8)
    pred = ev.predict(img)
    assert pred.shape[1] == 6
    if len(pred):
        # all surviving scores above the reference's 0.1 filter
        assert (pred[:, 4] > 0.1).all()
        assert (pred[:, 5] >= 1).all() and (pred[:, 5] <= 10).all()
        # inside the valid extent
        cx = pred[:, 0] + pred[:, 2] / 2
        assert (cx <= 110 + 8).all()
