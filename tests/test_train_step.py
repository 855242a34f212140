"""Train-step tests on the 8-device virtual CPU mesh: SPMD semantics
(grad pmean, SyncBN, data sharding) without real TPUs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rrnet_tpu import config as cfglib
from rrnet_tpu.train import Trainer

pytestmark = pytest.mark.slow


def tiny_cfg(name, **over):
    cfg = cfglib.PRESETS[name]()
    cfg = cfglib.set_by_path(cfg, "train.crop_size", (64, 64))
    cfg = cfglib.set_by_path(cfg, "train.max_objects", 16)
    cfg = cfglib.set_by_path(cfg, "model.topk", 32)
    cfg = cfglib.set_by_path(cfg, "model.stage2_rois", 8)
    if cfg.model.backbone == "hourglass":
        cfg = cfglib.set_by_path(cfg, "model.backbone", "tiny_hourglass")
    if cfg.model.name == "retinanet":
        cfg = cfglib.set_by_path(cfg, "model.backbone", "resnet10")
    for k, v in over.items():
        cfg = cfglib.set_by_path(cfg, k, v)
    return cfg


def synthetic_batch(b, n=16, hw=64, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.randn(b, hw, hw, 3).astype(np.float32)
    xy = rng.rand(b, n, 2) * (hw - 24)
    wh = rng.rand(b, n, 2) * 16 + 4
    cls = rng.randint(1, 11, (b, n, 1)).astype(np.float32)
    pad = np.ones((b, n, 1), np.float32)
    annos = np.concatenate([xy, wh, pad, cls, pad, pad], -1).astype(np.float32)
    valid = np.ones((b, n), bool)
    valid[:, n // 2:] = rng.rand(b, n - n // 2) > 0.3
    return {"images": jnp.asarray(images), "annos": jnp.asarray(annos),
            "valid": jnp.asarray(valid)}


def test_mesh_has_8_devices():
    assert jax.device_count() == 8


@pytest.mark.parametrize("name", ["centernet", "retinanet", "rrnet"])
def test_train_step_runs_and_losses_finite(name):
    cfg = tiny_cfg(name)
    trainer = Trainer(cfg)
    state = trainer.init_state()
    batch = trainer.shard(synthetic_batch(8))
    state, metrics = trainer.train_step(state, batch)
    metrics = jax.device_get(metrics)
    for k, v in metrics.items():
        assert np.isfinite(v), (k, v)
    assert int(state.step) == 1


def test_loss_decreases_centernet():
    cfg = tiny_cfg("centernet")
    trainer = Trainer(cfg)
    state = trainer.init_state()
    batch = trainer.shard(synthetic_batch(8))
    first = None
    for _ in range(12):
        state, metrics = trainer.train_step(state, batch)
        if first is None:
            first = float(metrics["total"])
    last = float(metrics["total"])
    assert last < first, (first, last)


def test_rrnet_stage2_gated_by_warmup():
    cfg = tiny_cfg("rrnet", **{"train.stage2_warmup_steps": 1000000})
    trainer = Trainer(cfg)
    state = trainer.init_state()
    batch = trainer.shard(synthetic_batch(8))
    _, metrics = trainer.train_step(state, batch)
    # s2 is still reported but must not blow up the total:
    # total == hm + 0.1*wh + off when gated
    expected = (float(metrics["hm"]) + 0.1 * float(metrics["wh"])
                + float(metrics["off"]))
    np.testing.assert_allclose(float(metrics["total"]), expected, rtol=1e-5)


def test_grads_synced_across_shards():
    """After one step the replicated params must be identical on all
    devices (pmean'd grads)."""
    cfg = tiny_cfg("centernet")
    trainer = Trainer(cfg)
    state = trainer.init_state()
    batch = trainer.shard(synthetic_batch(8, seed=3))
    state, _ = trainer.train_step(state, batch)
    leaf = jax.tree.leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_nonfinite_loss_skips_update():
    """A poisoned batch (inf pixels -> non-finite loss) must not change
    the params (the TPU analogue of the reference's OOM-skip)."""
    cfg = tiny_cfg("centernet")
    trainer = Trainer(cfg)
    state = trainer.init_state()
    batch = synthetic_batch(8)
    batch["images"] = jnp.asarray(
        np.full((8, 64, 64, 3), np.inf, np.float32))
    # snapshot to host BEFORE the step: train_step donates the state, so
    # the old device buffers are invalidated afterwards
    before = np.asarray(jax.tree.leaves(state.params)[0])
    state, metrics = trainer.train_step(state, trainer.shard(batch))
    after = jax.tree.leaves(state.params)[0]
    assert float(metrics["skipped"]) == 1.0
    np.testing.assert_array_equal(before, np.asarray(after))
    # and a healthy batch afterwards still trains
    state, metrics = trainer.train_step(state, trainer.shard(synthetic_batch(8)))
    assert float(metrics["skipped"]) == 0.0
    assert np.isfinite(float(metrics["total"]))


def test_fused_adam_matches_optax():
    """The fused skip-aware Adam (state.apply_gradients with good=1)
    must track optax.adam step-for-step."""
    import optax
    from rrnet_tpu.train.state import TrainState

    rng = np.random.RandomState(0)
    params = {"a": jnp.asarray(rng.randn(32), jnp.float32),
              "b": {"w": jnp.asarray(rng.randn(4, 4), jnp.float32)}}
    schedule = lambda c: 2.5e-4 * (0.5 ** (c // 3))  # noqa: E731
    tx = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx.init(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats={}, opt_state=opt_state, apply_fn=None,
                       tx=tx, schedule=schedule)
    ref_params, ref_opt = params, opt_state
    for i in range(7):
        grads = jax.tree.map(
            lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params)
        state = state.apply_gradients(grads, good=jnp.float32(1.0))
        updates, ref_opt = tx.update(grads, ref_opt, ref_params)
        ref_params = optax.apply_updates(ref_params, updates)
        for ours, ref in zip(jax.tree.leaves(state.params),
                             jax.tree.leaves(ref_params)):
            np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                       rtol=1e-6, atol=1e-7)
    # counters advanced identically
    assert int(state.opt_state[0].count) == int(ref_opt[0].count) == 7
    assert int(state.step) == 7

    # and a skipped step changes nothing, including the counters
    before = jax.device_get(state)
    grads = jax.tree.map(jnp.ones_like, params)
    state = state.apply_gradients(grads, good=jnp.float32(0.0))
    for a, b in zip(jax.tree.leaves(before.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state.opt_state[0].count) == 7
    assert int(state.step) == 7
