"""Checkpoint save/restore (orbax).

Upgrades the reference's save-only `torch.save(state_dict)` protocol
(operators/base_operator.py:43-51 — no optimizer state, no mid-training
resume) to full train-state checkpoints: params + BN stats + optimizer
moments + step, step-indexed (`ckp-{step}`), with retention.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(log_dir: str, state, step: Optional[int] = None,
                    keep: int = 5) -> str:
    """Save the full TrainState pytree (minus static fields)."""
    step = int(state.step) if step is None else step
    path = os.path.abspath(os.path.join(log_dir, f"ckp-{step}"))
    payload = {
        "step": np.asarray(jax.device_get(state.step)),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    _ckptr().save(path, payload, force=True)
    _cleanup(log_dir, keep)
    return path


def restore_checkpoint(log_dir_or_path: str, state,
                       step: Optional[int] = None):
    """Restore into a template TrainState (from create_train_state)."""
    path = log_dir_or_path
    if step is not None:
        path = os.path.join(log_dir_or_path, f"ckp-{step}")
    elif not os.path.basename(path).startswith("ckp-"):
        steps = available_steps(path)
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = os.path.join(path, f"ckp-{steps[-1]}")
    template = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    import orbax.checkpoint as ocp
    restored = _ckptr().restore(os.path.abspath(path),
                                args=ocp.args.PyTreeRestore(item=template))
    return state.replace(
        step=restored["step"], params=restored["params"],
        batch_stats=restored["batch_stats"], opt_state=restored["opt_state"])


def available_steps(log_dir: str):
    if not os.path.isdir(log_dir):
        return []
    steps = []
    for d in os.listdir(log_dir):
        if d.startswith("ckp-"):
            try:
                steps.append(int(d.split("-")[1]))
            except ValueError:
                continue
    return sorted(steps)


def _cleanup(log_dir: str, keep: int):
    import shutil
    steps = available_steps(log_dir)
    for s in steps[:-keep] if keep > 0 else []:
        shutil.rmtree(os.path.join(log_dir, f"ckp-{s}"), ignore_errors=True)


def save_params_only(path: str, params: Any) -> str:
    """Inference-export: params-only checkpoint (the reference's
    state_dict analogue)."""
    _ckptr().save(os.path.abspath(path), jax.device_get(params), force=True)
    return path


def load_params_only(path: str):
    return _ckptr().restore(os.path.abspath(path))
