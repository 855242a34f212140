"""rrnet_tpu — a TPU-native (JAX / XLA / Pallas / pjit) detection framework.

A ground-up rebuild of the capabilities of ouc-ocean-group/RRNet (ICCV'19
VisDrone challenge hybrid detector): three detector families (CenterNet,
RRNet, RetinaNet), six backbones, device-side NMS / soft-NMS / ROI-align /
deformable-conv kernels, a VisDrone data pipeline with heatmap target
rendering and roadmap-guided copy-paste augmentation, SPMD data-parallel
training over a `jax.sharding.Mesh`, and a from-scratch VisDrone AP
evaluator.

Design stance (TPU-first, not a port):
  * functional core — models are flax.linen modules, the train step is one
    jitted pure function;
  * everything in the hot path has static shapes: detection candidates are
    fixed-K top-k sets with validity masks instead of dynamic filtering;
  * parallelism is a device mesh + `shard_map`, collectives are XLA
    `psum`/`pmean` (no NCCL-style process bookkeeping);
  * NMS / soft-NMS / ROI-align / DCNv2 are device ops (XLA + Pallas), with
    a C++ host library for bit-exact CPU parity checks.
"""

__version__ = "0.1.0"

from rrnet_tpu import config as config  # noqa: F401

_LAZY = {
    "Trainer": ("rrnet_tpu.train", "Trainer"),
    "Evaluator": ("rrnet_tpu.evallib.infer", "Evaluator"),
    "build_model": ("rrnet_tpu.models", "build_model"),
    "create_mesh": ("rrnet_tpu.parallel", "create_mesh"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'rrnet_tpu' has no attribute {name!r}")
