import numpy as np
import jax
import jax.numpy as jnp

from rrnet_tpu import config as cfglib
from rrnet_tpu.models import build_model
from rrnet_tpu.train.state import create_train_state
from rrnet_tpu.utils import checkpoint as ckpt
import pytest

pytestmark = pytest.mark.slow


def small_state():
    cfg = cfglib.centernet_config()
    cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
    model = build_model(cfg)
    return cfg, model, create_train_state(
        cfg, model, jnp.zeros((1, 64, 64, 3)))


def test_save_restore_roundtrip(tmp_path):
    cfg, model, state = small_state()
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    path = ckpt.save_checkpoint(str(tmp_path), state)
    assert path.endswith("ckp-42")

    _, _, template = small_state()
    restored = ckpt.restore_checkpoint(str(tmp_path), template)
    assert int(restored.step) == 42
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_latest_selection_and_cleanup(tmp_path):
    cfg, model, state = small_state()
    for s in (10, 20, 30):
        ckpt.save_checkpoint(str(tmp_path), state.replace(
            step=jnp.asarray(s, jnp.int32)), keep=2)
    steps = ckpt.available_steps(str(tmp_path))
    assert steps == [20, 30]
    restored = ckpt.restore_checkpoint(str(tmp_path), state)
    assert int(restored.step) == 30


def test_params_only(tmp_path):
    cfg, model, state = small_state()
    p = str(tmp_path / "export")
    ckpt.save_params_only(p, state.params)
    loaded = ckpt.load_params_only(p)
    for x, y in zip(jax.tree.leaves(state.params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
