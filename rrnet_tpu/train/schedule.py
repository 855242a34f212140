"""Learning-rate schedules.

Rebuilds the reference's two schedules as optax schedules:
  * MultiStepLR (Adam + milestones x0.1 — operators/rrnet_operator.py:31)
  * WarmupMultiStepLR (utils/warmup_lr.py:10-52, maskrcnn-benchmark
    style linear/constant warmup; imported but unused by the reference —
    provided for parity and actually useful on TPU with large batches).

Note the reference calls `lr_sch.step()` *before* `optimizer.step()`
(PyTorch-1.1 ordering, rrnet_operator.py:117), so its effective lr
drops one step earlier than the milestone; optax schedules are indexed
by the pre-update step count, which reproduces that off-by-one exactly.
"""

from __future__ import annotations

from typing import Sequence

import optax


def multistep_lr(base_lr: float, milestones: Sequence[int],
                 gamma: float = 0.1,
                 warmup_steps: int = 0,
                 warmup_factor: float = 1.0 / 3.0,
                 warmup_method: str = "linear") -> optax.Schedule:
    boundaries = {int(m): gamma for m in milestones}
    decay = optax.piecewise_constant_schedule(base_lr, boundaries)
    if warmup_steps <= 0:
        return decay

    def schedule(step):
        import jax.numpy as jnp
        lr = decay(step)
        if warmup_method == "linear":
            alpha = step / warmup_steps
            w = warmup_factor * (1 - alpha) + alpha
        else:  # constant
            w = warmup_factor
        return jnp.where(step < warmup_steps, lr * w, lr)

    return schedule
