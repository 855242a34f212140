"""Trainer: one jitted SPMD train step per detector family.

Replaces the reference's operator classes (`operators/*_operator.py`)
and its DDP runtime: instead of mp.spawn + NCCL all-reduce hooks, the
train step is a single pure function `shard_map`'d over the device mesh
— the batch is sharded on the `data` axis, gradients (and logged
losses) are `lax.pmean`'d across it, and SyncBN statistics are synced
inside the model via BatchNorm(axis_name='data') (RRNet only,
mirroring rrnet_operator.py:27).

CenterNet-family targets (gaussian heatmaps / wh / offset / masks) are
rendered on device inside the step from the padded annotation tensor.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rrnet_tpu.config import Config
from rrnet_tpu.models import build_model
from rrnet_tpu.models.anchors import anchors_for_shape
from rrnet_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from rrnet_tpu.train import criterions
from rrnet_tpu.train.state import TrainState, create_train_state


class Trainer:
    """Builds the model, the sharded train step, and the initial state.

    Usage:
        trainer = Trainer(cfg)
        state = trainer.init_state()
        state, metrics = trainer.train_step(state, batch)

    batch: dict with
        images: (B, H, W, 3) float32, normalized
        annos:  (B, N, 8) float32 VisDrone rows [x, y, w, h, score, cls,
                trunc, occ] in input pixels
        n_valid mask: (B, N) bool
    B is the GLOBAL batch (data-parallel size x per-device batch).
    """

    def __init__(self, cfg: Config, mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else create_mesh(cfg.mesh)
        self.model = build_model(cfg, bn_axis=cfg.mesh.data_axis)
        ch, cw = cfg.train.crop_size
        s = cfg.train.scale_factor
        self.feat_shape = (ch // s, cw // s)

        if cfg.model.name == "retinanet":
            m = cfg.model
            self.anchors = jnp.asarray(anchors_for_shape(
                tuple(cfg.train.crop_size),
                pyramid_levels=tuple(m.anchor_levels),
                sizes=tuple(m.anchor_sizes),
                ratios=tuple(m.anchor_ratios),
                scales=tuple(m.anchor_scales)))
        else:
            self.anchors = None

        self.train_step = self._build_train_step()

    # ------------------------------------------------------------------
    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        ch, cw = self.cfg.train.crop_size
        sample = jnp.zeros((1, ch, cw, 3), jnp.float32)
        state = create_train_state(self.cfg, self.model, sample, rng)
        return replicate(state, self.mesh)

    def shard(self, batch):
        return shard_batch(batch, self.mesh, self.cfg.mesh.data_axis)

    # ------------------------------------------------------------------
    def _losses(self, outs, annos, valid, step) -> Tuple[jnp.ndarray, Dict]:
        cfg = self.cfg
        name = cfg.model.name
        if name == "retinanet":
            loc, cls = outs
            ld = criterions.retinanet_criterion(
                loc, cls, annos, valid, self.anchors,
                pos_iou=cfg.model.retina_pos_iou,
                neg_iou=cfg.model.retina_neg_iou,
                alpha=cfg.model.retina_alpha,
                gamma=cfg.model.retina_gamma)
            total = ld["cls"] + ld["reg"]
            return total, ld

        targets = criterions.centernet_targets(
            annos, valid, self.feat_shape, cfg.train.scale_factor,
            cfg.num_classes)
        if name == "centernet":
            hms, whs, offs = outs
            ld = criterions.centernet_criterion(hms, whs, offs, targets)
            total = ld["hm"] + cfg.train.wh_weight * ld["wh"] + ld["off"]
            return total, ld
        # rrnet
        ld = criterions.centernet_criterion(outs.hms, outs.whs,
                                            outs.offsets, targets)
        s2 = criterions.rrnet_stage2_criterion(outs, annos, valid,
                                               cfg.train.scale_factor)
        # stage-2 gated off for the first N steps (rrnet_operator.py:132-135)
        s2_factor = jnp.where(step < cfg.train.stage2_warmup_steps, 0.0, 1.0)
        ld = dict(ld, s2=s2)
        total = (ld["hm"] + cfg.train.wh_weight * ld["wh"] + ld["off"]
                 + s2 * s2_factor)
        return total, ld

    # ------------------------------------------------------------------
    def _build_train_step(self) -> Callable:
        mesh = self.mesh
        axis = self.cfg.mesh.data_axis
        model = self.model

        mean = jnp.asarray(self.cfg.train.mean, jnp.float32)
        std = jnp.asarray(self.cfg.train.std, jnp.float32)

        ch, cw = self.cfg.train.crop_size

        def value_grads(state: TrainState, images, annos, valid):
            """Shared forward+backward core: normalized inputs, loss,
            pmean'd grads, updated BN stats. Runs inside shard_map."""
            # Input transports (all normalized on device):
            #   (B, 1.5*H*W) uint8 — packed YUV 4:2:0 wire rows
            #     (train.transport='yuv420'; half the bytes of RGB)
            #   (B, H, W, 3) uint8 — raw RGB crops (transport='rgb')
            #   (B, H, W, 3) float — pre-normalized (synthetic tests)
            if images.ndim == 2:
                from rrnet_tpu.data.yuv420 import unpack_yuv420_device
                images = unpack_yuv420_device(images, ch, cw) / 255.0
                images = (images - mean) / std
            elif images.dtype == jnp.uint8:
                images = (images.astype(jnp.float32) / 255.0 - mean) / std

            def loss_fn(params):
                variables = {"params": params,
                             "batch_stats": state.batch_stats}
                outs, mut = model.apply(variables, images, train=True,
                                        mutable=["batch_stats"])
                total, ld = self._losses(outs, annos, valid, state.step)
                return total, (mut.get("batch_stats", state.batch_stats), ld)

            (total, (new_bs, ld)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads = jax.lax.pmean(grads, axis)
            return total, grads, new_bs, ld

        def step_fn(state: TrainState, images, annos, valid):
            total, grads, new_bs, ld = value_grads(state, images,
                                                   annos, valid)
            # Failure containment (the reference catches CUDA OOM and
            # skips the step, rrnet_operator.py:120-126; the analogous
            # TPU hazard is a non-finite loss/grad poisoning the params):
            # if any replica produced a non-finite total loss, the
            # update is skipped EXACTLY — params, Adam moments, step
            # counter and batch stats all unchanged. The skip is fused
            # into the Adam arithmetic itself (state.apply_gradients
            # scales every delta by `good`), not a post-hoc whole-tree
            # select, which would cost ~2k small copy/select ops/step.
            good = jax.lax.pmean(
                jnp.isfinite(total).astype(jnp.float32), axis) >= 1.0
            metrics = jax.lax.pmean(dict(ld, total=total), axis)
            metrics["skipped"] = 1.0 - good.astype(jnp.float32)
            # poisoned grads must not produce NaN*0 in the fused update:
            # sanitize them under the same `good` flag
            grads = jax.tree.map(
                lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
            new_state = state.apply_gradients(
                grads, new_batch_stats=new_bs, good=good)
            return new_state, metrics

        sharded = shard_map(
            step_fn, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False)

        # Diagnostic surface: the pmean'd loss/grads WITHOUT applying the
        # update. This is the quantity the reference's DDP hook
        # all-reduces (operators/base_operator.py:24) — the 2-process
        # equivalence test asserts it matches the single-process value
        # (tests/test_multiprocess_train.py); also useful for gradient-
        # noise-scale probes.
        def grads_fn(state, images, annos, valid):
            total, grads, _, _ = value_grads(state, images, annos, valid)
            return jax.lax.pmean(total, axis), grads

        sharded_grads = shard_map(
            grads_fn, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False)

        @jax.jit
        def loss_and_grads(state, batch):
            return sharded_grads(state, batch["images"], batch["annos"],
                                 batch["valid"])

        self.loss_and_grads = loss_and_grads

        # Donating the state lets XLA update the f32 master params and
        # both Adam moments in place instead of materializing fresh
        # copies of the full parameter tree every step (the copy pass
        # alone was ~20% of step time on v5e). Callers must rebind:
        # `state, metrics = trainer.train_step(state, batch)`.
        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state, batch):
            return sharded(state, batch["images"], batch["annos"],
                           batch["valid"])

        return train_step
