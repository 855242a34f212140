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
    # Adam hyper-params for the fused skip-aware update below (the
    # optax-state layout is kept, so checkpoints are unaffected)
    schedule: Optional[Callable] = struct.field(pytree_node=False,
                                                default=None)
    b1: float = struct.field(pytree_node=False, default=0.9)
    b2: float = struct.field(pytree_node=False, default=0.999)
    eps: float = struct.field(pytree_node=False, default=1e-8)

    def apply_gradients(self, grads, new_batch_stats=None, good=None):
        """Adam step with an optional fused exact-skip.

        `good` (scalar bool/0-1 float, or None for "always good") scales
        every state delta elementwise:

            mu'    = mu    + good * (1-b1) * (g  - mu)
            nu'    = nu    + good * (1-b2) * (g2 - nu)
            param' = param - good * lr * mu_hat / (sqrt(nu_hat) + eps)
            count' = count + good

        good=1 is exactly optax.adam's update; good=0 leaves params,
        both moments, the schedule counter and batch_stats untouched —
        the TPU analogue of the reference's OOM-catch-and-skip
        (rrnet_operator.py:120-126). Folding the skip into the update
        arithmetic instead of a post-hoc `jnp.where(good, new, old)`
        over the whole state tree removes ~2k per-leaf select/copy ops
        from the step program (measured ~5 ms/step at batch 8 on v5e).
        """
        if self.schedule is None:
            # legacy optax path (no fused skip)
            updates, new_opt = self.tx.update(grads, self.opt_state,
                                              self.params)
            new_params = optax.apply_updates(self.params, updates)
            new_bs = (new_batch_stats if new_batch_stats is not None
                      else self.batch_stats)
            return self.replace(step=self.step + 1, params=new_params,
                                batch_stats=new_bs, opt_state=new_opt)

        adam_st, sched_st = self.opt_state
        if good is None:
            g1 = jnp.float32(1.0)
        else:
            g1 = jnp.asarray(good).astype(jnp.float32)
        gi = g1.astype(jnp.int32)
        count = adam_st.count + gi
        # clamp: on a skipped FIRST step count stays 0 and 1-b**0 == 0
        # would give 0/0 (the whole update is scaled by good=0 anyway)
        cf = jnp.maximum(count, 1).astype(jnp.float32)
        c1 = 1.0 - self.b1 ** cf
        c2 = 1.0 - self.b2 ** cf
        # scale_by_schedule reads its count BEFORE incrementing (optax),
        # preserving the PyTorch-1.1 pre-step ordering in schedule.py
        lr = self.schedule(sched_st.count)
        b1, b2, eps = self.b1, self.b2, self.eps

        def upd(p, g, mu, nu):
            g = g.astype(mu.dtype)
            mu2 = mu + g1 * ((1.0 - b1) * (g - mu))
            nu2 = nu + g1 * ((1.0 - b2) * (g * g - nu))
            step = (mu2 / c1) / (jnp.sqrt(nu2 / c2) + eps)
            return p - (g1 * lr) * step.astype(p.dtype), mu2, nu2

        flat_p, treedef = jax.tree.flatten(self.params)
        flat_g = treedef.flatten_up_to(grads)
        flat_mu = treedef.flatten_up_to(adam_st.mu)
        flat_nu = treedef.flatten_up_to(adam_st.nu)
        out = [upd(p, g, mu, nu) for p, g, mu, nu in
               zip(flat_p, flat_g, flat_mu, flat_nu)]
        new_params = jax.tree.unflatten(treedef, [o[0] for o in out])
        new_mu = jax.tree.unflatten(treedef, [o[1] for o in out])
        new_nu = jax.tree.unflatten(treedef, [o[2] for o in out])

        if new_batch_stats is None:
            new_bs = self.batch_stats
        else:
            # plain select for the BN running stats: they are tiny (C,)
            # vectors, and a lerp would propagate NaN stats from a
            # skipped step's forward (NaN * 0 == NaN)
            keep = g1 >= 1.0
            new_bs = jax.tree.map(lambda n, o: jnp.where(keep, n, o),
                                  new_batch_stats, self.batch_stats)
        return self.replace(
            step=self.step + gi,
            params=new_params,
            batch_stats=new_bs,
            opt_state=(adam_st._replace(count=count, mu=new_mu, nu=new_nu),
                       sched_st._replace(count=sched_st.count + gi)),
        )


def make_schedule(cfg: Config) -> Callable:
    return multistep_lr(cfg.train.lr, cfg.train.lr_milestones,
                        cfg.train.lr_gamma, cfg.train.warmup_steps,
                        cfg.train.warmup_factor)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam with the reference hyper-params (lr 2.5e-4, x0.1 at
    milestones — configs/rrnet_config.py:26-31). torch Adam defaults:
    betas (0.9, 0.999), eps 1e-8, no weight decay (the reference config
    declares weight_decay but Adam is constructed without it,
    rrnet_operator.py:29)."""
    return optax.adam(make_schedule(cfg), b1=0.9, b2=0.999, eps=1e-8)


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
        schedule=make_schedule(cfg),
        b1=0.9, b2=0.999, eps=1e-8,
    )
