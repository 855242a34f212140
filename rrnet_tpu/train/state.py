"""Train state: params + BN stats + optimizer state + step, as one
pytree suitable for replication over the mesh and for orbax
checkpointing.

Unlike the reference — which saves only `model.state_dict()` and cannot
resume mid-training (operators/base_operator.py:43-51, SURVEY §5) — the
full state (including Adam moments and the step counter) round-trips
through checkpoints.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rrnet_tpu.config import Config
from rrnet_tpu.train.schedule import multistep_lr


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    # static (not traced)
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=new_opt,
        )


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam with the reference hyper-params (lr 2.5e-4, x0.1 at
    milestones — configs/rrnet_config.py:26-31). torch Adam defaults:
    betas (0.9, 0.999), eps 1e-8, no weight decay (the reference config
    declares weight_decay but Adam is constructed without it,
    rrnet_operator.py:29)."""
    schedule = multistep_lr(cfg.train.lr, cfg.train.lr_milestones,
                            cfg.train.lr_gamma, cfg.train.warmup_steps,
                            cfg.train.warmup_factor)
    return optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(cfg: Config, model, sample_input,
                       rng: Optional[jax.Array] = None) -> TrainState:
    """Initialize params/batch_stats with a jitted init and build the
    optimizer state."""
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)

    @jax.jit
    def init(rng, x):
        return model.init(rng, x, train=False)

    variables = init(rng, sample_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )
