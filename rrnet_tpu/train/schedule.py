"""Learning-rate schedules.

Rebuilds the reference's two schedules as optax schedules:
  * MultiStepLR (Adam + milestones x0.1 — operators/rrnet_operator.py:31)
  * WarmupMultiStepLR (utils/warmup_lr.py:10-52, maskrcnn-benchmark
    style linear/constant warmup; imported but unused by the reference —
    provided for parity and actually useful on TPU with large batches).

Note the reference calls `lr_sch.step()` *before* `optimizer.step()`
(PyTorch-1.1 ordering, rrnet_operator.py:117), so the lr used by update
i is the one for schedule counter i+1: the decay takes effect one
update earlier than the milestone. The schedule below reproduces that
exactly: update step i is decayed when i + 1 >= milestone.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp


def multistep_lr(base_lr: float, milestones: Sequence[int],
                 gamma: float = 0.1,
                 warmup_steps: int = 0,
                 warmup_factor: float = 1.0 / 3.0,
                 warmup_method: str = "linear") -> Callable:
    ms = jnp.asarray(sorted(int(m) for m in milestones), jnp.float32)

    def schedule(step):
        eff = step + 1  # PyTorch-1.1 pre-step ordering (see module doc)
        n_hit = jnp.sum(eff >= ms) if len(milestones) else 0.0
        lr = base_lr * (gamma ** n_hit)
        if warmup_steps > 0:
            if warmup_method == "linear":
                alpha = step / warmup_steps
                w = warmup_factor * (1 - alpha) + alpha
            else:  # constant
                w = warmup_factor
            lr = jnp.where(step < warmup_steps, lr * w, lr)
        return lr

    return schedule
