"""Multi-scale (+ flip-TTA) inference driver with shape bucketing.

Rebuilds the reference eval loops (operators/rrnet_operator.py:246-284,
operators/centernet_operator.py:251-297) TPU-first:

  * ONE host->device transfer per image, as uint8: the original image is
    padded to a shape bucket and shipped once; per-scale bilinear
    resizing, normalization, horizontal flip (within the valid extent)
    and bucket padding all run on device. (The reference re-uploads a
    full float image per scale per flip — 12x the bytes; over a remote
    TPU link that transfer dominates wall-clock.)
  * XLA compiles per shape, so scaled sizes are static per
    (bucket, scale): scaled = bucket * scale rounded up to a multiple of
    `bucket_multiple`. The content's exact scale ratio is scaled_bucket /
    bucket, used to rescale boxes back.
  * Padded area is masked out of the heatmap before top-k so it cannot
    emit detections.
  * Per-image post-processing (score filter, multi-scale merge, optional
    per-class soft-NMS, txt writing) stays on host via the native
    host_nms library.

CenterNet eval additionally runs horizontal-flip TTA per scale
(centernet_operator.py:266-283) and decodes only the LAST stack with
k=250 (the operator's transform_bbox default).
"""

from __future__ import annotations

import os
import threading
from functools import partial
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rrnet_tpu.config import Config
from rrnet_tpu.evallib import host_nms
from rrnet_tpu.evallib.writer import save_result
from rrnet_tpu.models import build_model
from rrnet_tpu.models.rrnet import mask_heatmap_extent
from rrnet_tpu.ops.box import decode_boxes
from rrnet_tpu.ops.heatmap import topk_decode


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


class StagedBatch(NamedTuple):
    """A host batch already uploaded to the device (from
    `Evaluator._upload`) — passing this to `dispatch_batch` skips the
    upload, so transfers can be staged on a background thread and
    overlap the previous batch's compute. A plain list/tuple of images
    is never mistaken for one (ADVICE r2: a 4-image tuple used to parse
    as a staged handle)."""
    payload: tuple          # device arrays, concat along batch = wire rows
    bucket: Tuple[int, int]
    hws: List[Tuple[int, int]]
    tight: Tuple[int, int]  # wire shape (padding to bucket added on device)


# YUV 4:2:0 transport (rationale + conventions in data/yuv420.py).
from rrnet_tpu.data.yuv420 import (  # noqa: E402
    pack_yuv420, unpack_yuv420_device as _unpack_yuv420_device)


def _flip_valid_width(img: jnp.ndarray, w_valid: jnp.ndarray) -> jnp.ndarray:
    """Horizontally flip only the first w_valid columns of (B, H, W, C)
    (keeps content left-aligned so extent masking still applies)."""
    w = img.shape[2]
    xs = jnp.arange(w)
    src = jnp.where(xs[None, :] < w_valid[:, None],
                    w_valid[:, None] - 1 - xs[None, :], xs[None, :])
    return jnp.take_along_axis(img, src[:, None, :, None], axis=2)


class Evaluator:
    """Runs a trained model over full images and produces (N, 6)
    [x, y, w, h, score, cls(1-based)] detections in original pixels."""

    def __init__(self, cfg: Config, variables, model=None,
                 bucket_multiple: int = 128, decode_topk: int = 250,
                 upload_streams: int = 1, mesh=None,
                 fuse_flip: bool = True, quantize: Optional[str] = None,
                 stage2_decode="full"):
        """mesh: optional jax.sharding.Mesh — eval batches are then
        sharded over the mesh's first (data) axis, so an N-chip mesh
        evaluates N images' programs concurrently (replaces the
        reference's single-GPU eval loop,
        operators/rrnet_operator.py:246-284). Batch sizes must be
        divisible by the data-axis size.

        stage2_decode: RRNet only — "full"/True applies the stage-2
        re-regression deltas; "stage1"/False reports the stage-1 ROIs
        directly (the ablation the reference's generate_bbox supports
        via its stage-1 return, operators/rrnet_operator.py:188-209);
        "zero" runs the SAME decode with all-zero deltas (the identity
        under the reference's +1-extent convention,
        rrnet_operator.py:198-205) — the fair baseline for "did the
        head learn anything", immune to the +1 growth that dominates
        when stage-1 boxes are already near-perfect. Used by the
        synthetic gate."""
        if quantize not in (None, "int8"):
            raise ValueError(f"quantize must be None or 'int8', got "
                             f"{quantize!r}")
        self.cfg = cfg
        self.mesh = mesh
        self.fuse_flip = fuse_flip
        # int8 PTQ (models/layers.py quant_context): body convs run on
        # the MXU's double-rate int8 path after `calibrate()` records
        # per-conv input ranges. Lazy auto-calibration uses the first
        # dispatched batch when calibrate() was never called.
        self.quantize = quantize
        self._quant_scales: Optional[dict] = None
        if stage2_decode in (True, False):
            stage2_decode = "full" if stage2_decode else "stage1"
        if stage2_decode not in ("full", "stage1", "zero"):
            raise ValueError(f"stage2_decode must be full/stage1/zero, "
                             f"got {stage2_decode!r}")
        self.stage2_decode = stage2_decode
        self.model = model if model is not None else build_model(cfg)
        self.variables = variables
        self.bucket_multiple = bucket_multiple
        self.decode_topk = decode_topk
        self.mean = np.asarray(cfg.val.mean, np.float32)
        self.std = np.asarray(cfg.val.std, np.float32)
        self.transport = getattr(cfg.val, "transport", "rgb")
        # Inference-time constant folding: BN parameters and running
        # stats are closed over as numpy constants instead of passed as
        # program arguments, so XLA folds every per-channel affine chain
        # (scale*rsqrt(var+eps) etc.) at compile time. Removes ~3000
        # tiny per-call ops on the hourglass (~6% wall). Weights stay
        # runtime arguments (full freezing would bloat the executable).
        self._arg_treedef = None
        self._const_leaves = None
        self._arg_values = None
        self._split_variables(variables)
        # Images ship as ONE flat uint8 buffer per batch: flat buffers
        # take the raw transfer path (no host-side relayout for tiled
        # device layouts). Default is a SINGLE device_put stream —
        # measured on this rig (scripts/probe_transport.py), concurrent
        # device_puts contend and aggregate well below one stream when
        # the link is congested (104 MB/s single vs 37 MB/s over 2
        # streams), and match it at best when the link is fast.
        self.upload_streams = max(1, int(upload_streams))
        self._upload_pool = None
        self._compiled: Dict[Tuple, callable] = {}
        # per-bucket sticky wire shape + per-thread pad scratch (see
        # _upload)
        self._tight_cache: Dict[Tuple[int, int], Tuple[int, int]] = {}
        self._pad_scratch: Dict[Tuple, np.ndarray] = {}

    # ------------------------------------------------------------------
    def _split_variables(self, variables):
        from jax.tree_util import tree_flatten_with_path
        leaves, treedef = tree_flatten_with_path(variables)
        arg_vals, const_leaves = [], []
        for path, leaf in leaves:
            keys = [str(getattr(k, "key", getattr(k, "name", "")))
                    for k in path]
            is_bn = any("BatchNorm" in k for k in keys) or (
                keys and keys[0] == "batch_stats")
            if is_bn:
                const_leaves.append(np.asarray(leaf))
            else:
                const_leaves.append(None)
                arg_vals.append(leaf)
        self._arg_treedef = treedef
        self._const_leaves = const_leaves
        self._arg_values = arg_vals

    def _rebuild_variables(self, args):
        from jax.tree_util import tree_unflatten
        it = iter(args)
        leaves = [c if c is not None else next(it)
                  for c in self._const_leaves]
        return tree_unflatten(self._arg_treedef, leaves)

    def update_variables(self, variables):
        """Swap in new weights (e.g. a later checkpoint). BN constants
        are baked into compiled programs, so the program cache is
        dropped (weights-only args would silently keep old BN stats)."""
        self.variables = variables
        self._split_variables(variables)
        self._compiled.clear()
        # activation ranges depend on the weights; recalibrate lazily
        self._quant_scales = None

    # ------------------------------------------------------------------
    def _build_preprocess(self, bucket: Tuple[int, int],
                          scaled: Tuple[int, int], flip,
                          tight: Tuple[int, int]):
        """Device-side preprocess closure shared by the predict programs
        and the quantization-calibration pass: unpack wire payload ->
        pad to bucket -> normalize -> resize to `scaled` -> optional
        flip. Returns (x, scaled_valid_hw)."""
        mean = jnp.asarray(self.mean)
        std = jnp.asarray(self.std)
        transport = self.transport
        bh, bw = bucket
        th, tw = tight
        sh, sw = scaled

        def preprocess(payload, valid_hw):
            flat = (payload[0] if len(payload) == 1
                    else jnp.concatenate(payload, axis=0))
            n = flat.shape[0]
            if transport == "yuv420":
                x = _unpack_yuv420_device(flat, th, tw) / 255.0
            else:
                x = flat.reshape(n, th, tw, 3).astype(jnp.float32) / 255.0
            if (th, tw) != (bh, bw):
                # edge-replicate, not zero: at protocol scales > 1 the
                # bilinear resize below samples ~1 px past the tight
                # extent, and a zero (-mean/std after normalize) band
                # would bleed into the valid boundary pixels — edge
                # padding reproduces exactly the clamped samples a
                # tight-image resize (the reference protocol,
                # operators/rrnet_operator.py:260) would take; the pad
                # band itself is suppressed by decode-extent masking
                x = jnp.pad(x, ((0, 0), (0, bh - th), (0, bw - tw), (0, 0)),
                            mode="edge")
            x = (x - mean) / std
            if scaled != bucket:
                x = jax.image.resize(
                    x, (x.shape[0], sh, sw, x.shape[3]), method="bilinear")
            ry = sh / bucket[0]
            rx = sw / bucket[1]
            vhw = jnp.stack([
                jnp.ceil(valid_hw[:, 0] * ry),
                jnp.ceil(valid_hw[:, 1] * rx)], axis=1).astype(jnp.int32)
            if flip == "both":
                x = jnp.concatenate(
                    [x, _flip_valid_width(x, vhw[:, 1])], axis=0)
                vhw = jnp.concatenate([vhw, vhw], axis=0)
            elif flip:
                x = _flip_valid_width(x, vhw[:, 1])
            return x, vhw

        return preprocess

    def calibrate(self, images) -> dict:
        """Post-training-quantization calibration: run one representative
        batch (a list of images, or an already-staged upload) through
        the eval preprocess + forward with models.layers' "calibrate"
        mode active, recording every eligible conv's input absmax.
        Stores the scales for subsequent int8 programs and returns them.
        Compiled programs are dropped (they were traced without the
        int8 mode).

        Calibration runs once per DISTINCT protocol scale in
        `cfg.val.scales` and takes the elementwise max of the recorded
        ranges: multi-scale TTA evaluates upscaled inputs whose
        activations can exceed the scale-1.0 absmax, and clipping there
        would add unmeasured AP loss. Flip is skipped — a mirrored image
        contains the same pixel values, so its ranges are identical."""
        from rrnet_tpu.models.layers import (quant_context,
                                             quant_scales_from_stats)
        if isinstance(images, StagedBatch):
            payload, bucket, hws, tight = images
        else:
            payload, bucket, hws, tight = self._upload(list(images))
        model = self.model
        name = self.cfg.model.name
        rebuild = self._rebuild_variables
        vhw_arr = jnp.asarray(hws, jnp.int32)

        stats_per_scale = []
        for scale in dict.fromkeys(self.cfg.val.scales):
            scaled = self._scaled_shape(bucket, scale)
            pre = self._build_preprocess(bucket, scaled, False, tight)

            def fn(args, payload, valid_hw, _pre=pre):
                x, vhw = _pre(payload, valid_hw)
                kwargs = {"valid_hw": vhw} if name == "rrnet" else {}
                _, mutated = model.apply(rebuild(args), x, train=False,
                                         mutable=["quant_stats"], **kwargs)
                return mutated["quant_stats"]

            with quant_context("calibrate"):
                stats_per_scale.append(jax.device_get(
                    jax.jit(fn)(self._arg_values, payload, vhw_arr)))
        self._quant_scales = quant_scales_from_stats(stats_per_scale)
        if not self._quant_scales:
            raise RuntimeError(
                "calibration recorded no conv ranges — the model has no "
                "quantization-eligible convolutions")
        self._compiled.clear()
        return self._quant_scales

    def _predict_fn(self, bucket: Tuple[int, int], scaled: Tuple[int, int],
                    flip: bool, batch: int = 1,
                    tight: Optional[Tuple[int, int]] = None):
        """Jitted (bucket, scaled, flip, batch) program: device-side
        preprocess (unpack/pad/normalize/resize/flip) + forward + decode.
        `tight` is the wire shape: images ship at the even-rounded batch
        max size and are padded to `bucket` on device, so bucket padding
        (e.g. 1360x765 -> 1408x768, ~4%) never crosses the link."""
        tight = tight or bucket
        key = (bucket, scaled, flip, batch, tight)
        if key in self._compiled:
            return self._compiled[key]
        # flip may be False, True, or "both": the fused-TTA variant runs
        # the unflipped and flipped halves as ONE concatenated (2B)
        # forward — half the program dispatches (each dispatch costs an
        # RPC on remote rigs) and better MXU utilization at small
        # batches than the reference's one-forward-per-flip loop
        # (operators/centernet_operator.py:266-283).

        name = self.cfg.model.name
        model = self.model
        k = self.decode_topk
        s = self.cfg.train.scale_factor
        rebuild = self._rebuild_variables

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            _data = NamedSharding(
                self.mesh, PartitionSpec(self.mesh.axis_names[0]))
            _repl = NamedSharding(self.mesh, PartitionSpec())

            def maybe_jit(f):
                return jax.jit(
                    f,
                    in_shardings=(
                        [_repl] * len(self._arg_values),
                        (_data,) * 1, _data),
                    out_shardings=_data)
        else:
            maybe_jit = jax.jit

        preprocess = self._build_preprocess(bucket, scaled, flip, tight)

        def pack(xywh, score, classes, valid):
            """One (B, K, 6) [x,y,w,h,score,cls] output per program —
            invalid rows get score -1 — so `collect` makes a single
            device->host fetch per program (the per-fetch round-trip
            over a remote link dominates at these sizes)."""
            score = jnp.where(valid, score, -1.0)
            return jnp.concatenate(
                [xywh, score[..., None], classes[..., None]], axis=-1)

        if name == "retinanet":
            # reference operators/retinanet_operator.py:179-258: per-anchor
            # max-class sigmoid score (>0.1), standardized-delta decode,
            # class-agnostic hard NMS at 0.3 (the CUDA gpu_nms, +1 extents)
            from rrnet_tpu.models.anchors import anchors_for_shape
            from rrnet_tpu.ops.nms import hard_nms
            m = self.cfg.model
            anchors = jnp.asarray(anchors_for_shape(
                scaled, pyramid_levels=tuple(m.anchor_levels),
                sizes=tuple(m.anchor_sizes), ratios=tuple(m.anchor_ratios),
                scales=tuple(m.anchor_scales)))
            topk = min(self.decode_topk * 4, anchors.shape[0])

            @maybe_jit
            def fn(args, payload, valid_hw):
                x, vhw = preprocess(payload, valid_hw)
                loc, cls = model.apply(rebuild(args), x, train=False)
                prob = jax.nn.sigmoid(cls.astype(jnp.float32))
                best, best_idx = prob.max(-1), prob.argmax(-1)
                # drop anchors whose centers fall in the padded area
                acx = (anchors[:, 0] + anchors[:, 2]) / 2
                acy = (anchors[:, 1] + anchors[:, 3]) / 2
                inside = ((acx[None] < vhw[:, 1:2]) &
                          (acy[None] < vhw[:, 0:1]))
                best = jnp.where(inside, best, 0.0)

                def one(loc_i, best_i, idx_i):
                    score, sel = jax.lax.top_k(best_i, topk)
                    a = anchors[sel]
                    d = loc_i[sel].astype(jnp.float32)
                    aw = a[:, 2] - a[:, 0]
                    ah = a[:, 3] - a[:, 1]
                    cx = a[:, 0] + 0.5 * aw + d[:, 0] * 0.1 * aw
                    cy = a[:, 1] + 0.5 * ah + d[:, 1] * 0.1 * ah
                    w = jnp.exp(d[:, 2] * 0.2) * aw
                    h = jnp.exp(d[:, 3] * 0.2) * ah
                    boxes = jnp.stack([cx - w / 2, cy - h / 2,
                                       cx + w / 2, cy + h / 2], -1)
                    valid = score > 0.1
                    keep = hard_nms(boxes, score, 0.3, valid=valid,
                                    plus_one=True)
                    xywh = jnp.stack([boxes[:, 0], boxes[:, 1],
                                      boxes[:, 2] - boxes[:, 0],
                                      boxes[:, 3] - boxes[:, 1]], -1)
                    return (xywh, score,
                            idx_i[sel].astype(jnp.float32) + 1.0,
                            keep & valid)

                xywh, score, classes, valid = jax.vmap(one)(loc, best, best_idx)
                return pack(xywh, score, classes, valid)
        elif name == "rrnet":
            s2_mode = self.stage2_decode

            @maybe_jit
            def fn(args, payload, valid_hw):
                x, vhw = preprocess(payload, valid_hw)
                outs = model.apply(rebuild(args), x, train=False,
                                   valid_hw=vhw)
                rois_xyxy = outs.rois * s
                rois_xywh = jnp.concatenate(
                    [rois_xyxy[..., :2],
                     rois_xyxy[..., 2:4] - rois_xyxy[..., :2]], -1)
                if s2_mode == "full":
                    s2_xywh = decode_boxes(rois_xywh, outs.stage2_reg)
                elif s2_mode == "zero":
                    s2_xywh = decode_boxes(rois_xywh,
                                           jnp.zeros_like(outs.stage2_reg))
                else:
                    s2_xywh = rois_xywh
                return pack(s2_xywh, outs.roi_scores,
                            outs.roi_classes.astype(jnp.float32) + 1.0,
                            outs.roi_valid)
        else:
            @maybe_jit
            def fn(args, payload, valid_hw):
                x, vhw = preprocess(payload, valid_hw)
                hms, whs, regs = model.apply(rebuild(args), x, train=False)
                hm = mask_heatmap_extent(hms[-1].astype(jnp.float32), vhw, s)
                dets = topk_decode(hm, whs[-1].astype(jnp.float32),
                                   regs[-1].astype(jnp.float32),
                                   k=k, scale_factor=float(s))
                xywh = jnp.concatenate(
                    [dets.boxes[..., :2],
                     dets.boxes[..., 2:4] - dets.boxes[..., :2]], -1)
                return pack(xywh, dets.scores,
                            dets.classes.astype(jnp.float32) + 1.0,
                            dets.scores > 0)

        if self.quantize == "int8":
            if self._quant_scales is None:
                raise RuntimeError(
                    "quantize='int8' needs calibration scales — call "
                    "calibrate(images) first (dispatch_batch does this "
                    "automatically on its first batch)")
            from rrnet_tpu.models.layers import quant_context
            scales = dict(self._quant_scales)

            def quantized_call(*args, _fn=fn, _scales=scales):
                # the context only matters during the trace (first call);
                # afterwards the compiled program is fixed
                with quant_context("int8", _scales):
                    return _fn(*args)

            fn = quantized_call

        self._compiled[key] = fn
        return fn

    # ------------------------------------------------------------------
    def _upload(self, images):
        """Pad a list of same-bucket images and ship them as ONE batch:
        uint8 RGB, or (for transport='yuv420') Y + half-res CbCr planes
        at half the bytes."""
        hs = [im.shape[0] for im in images]
        ws = [im.shape[1] for im in images]
        bh = _round_up(max(hs), self.bucket_multiple)
        bw = _round_up(max(ws), self.bucket_multiple)
        # wire shape: 16-rounded batch max — bucket padding (~4% at
        # VisDrone val 1360x765 -> 1408x768) is added on DEVICE, so it
        # never crosses the (often bandwidth-bound) host->device link.
        # Sticky per bucket (grow-only) so same-bucket batches with
        # slightly different sizes reuse one compiled program.
        th = min(_round_up(max(hs), 16), bh)
        tw = min(_round_up(max(ws), 16), bw)
        sth, stw = self._tight_cache.get((bh, bw), (0, 0))
        th, tw = max(th, sth), max(tw, stw)
        self._tight_cache[(bh, bw)] = (th, tw)
        # Reusable pad scratch per wire shape: staging must be cheap on
        # a single-core host, so avoid allocating + zeroing 50+ MB per
        # batch. Only the trailing pad rows/cols of each slot are
        # re-zeroed (cheap; usually empty). Keyed additionally by
        # thread id: _upload may run on a staging worker concurrently
        # with a direct predict_batch call.
        key = (threading.get_ident(), th, tw)
        scr = self._pad_scratch.get(key)
        if scr is None or scr.shape[0] < len(images):
            scr = np.zeros((len(images), th, tw, 3), np.uint8)
            self._pad_scratch[key] = scr
        padded = scr[:len(images)]
        for i, im in enumerate(images):
            if im.dtype != np.uint8:
                im = np.clip(im * 255.0, 0, 255).astype(np.uint8)
            padded[i, :im.shape[0], :im.shape[1]] = im
            # edge-replicate (matches the device tight->bucket pad): a
            # zero band here would bleed -mean/std into the valid
            # boundary through the scale>1 bilinear resize
            if im.shape[0] < th:
                padded[i, im.shape[0]:] = padded[i, im.shape[0] - 1]
            if im.shape[1] < tw:
                padded[i, :, im.shape[1]:] = \
                    padded[i, :, im.shape[1] - 1][:, None]
        if self.transport == "yuv420":
            # planar I420 written directly into the wire rows (dst=)
            flat = pack_yuv420(padded)       # (B, 1.5*H*W) per-image rows
        else:
            flat = padded.reshape(len(images), -1).copy()
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            sh = NamedSharding(self.mesh, PartitionSpec(self.mesh.axis_names[0]))
            payload = (jax.device_put(flat, sh),)
        elif self.upload_streams == 1:
            payload = (jax.device_put(flat),)
        else:
            if self._upload_pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._upload_pool = ThreadPoolExecutor(
                    max_workers=self.upload_streams)
            chunks = np.array_split(flat, self.upload_streams, axis=0)
            payload = tuple(self._upload_pool.map(jax.device_put, chunks))
        return StagedBatch(payload, (bh, bw), list(zip(hs, ws)), (th, tw))

    def _scaled_shape(self, bucket, scale):
        return (_round_up(int(bucket[0] * scale), self.bucket_multiple),
                _round_up(int(bucket[1] * scale), self.bucket_multiple))

    # ------------------------------------------------------------------
    def dispatch_batch(self, images):
        """Async-dispatch the full (scales x flips) program set for a
        same-bucket image batch; returns a handle for `collect`.

        `images` may be a list of HWC arrays or a pre-staged upload
        (from `self._upload`, e.g. staged on a background thread so the
        host->device transfer overlaps the previous batch's compute)."""
        cfg = self.cfg
        if isinstance(images, StagedBatch):
            payload, bucket, hws, tight = images
        else:
            payload, bucket, hws, tight = self._upload(images)
        if self.quantize is not None and self._quant_scales is None:
            # lazy PTQ calibration on the first dispatched batch
            self.calibrate(StagedBatch(payload, bucket, hws, tight))
        vhw = jnp.asarray(hws, jnp.int32)
        n = len(hws)
        pending = []
        for scale in cfg.val.scales:
            scaled = self._scaled_shape(bucket, scale)
            if cfg.val.flip_tta:
                flips = ("both",) if self.fuse_flip else (True, False)
            else:
                flips = (False,)
            for flip in flips:
                fn = self._predict_fn(bucket, scaled, flip, n, tight)
                out = fn(self._arg_values, payload, vhw)
                ry = scaled[0] / bucket[0]
                rx = scaled[1] / bucket[1]
                pending.append((out, flip, ry, rx))
        return (pending, n, hws)

    def collect(self, handle) -> List[np.ndarray]:
        """Fetch + host-post-process a dispatched batch -> per-image
        (N, 6) xywh+score+cls rows sorted by score."""
        cfg = self.cfg
        pending, n, hws = handle
        per_img: List[List[np.ndarray]] = [[] for _ in range(n)]
        for packed, flip, ry, rx in pending:
            packed = np.asarray(packed, np.float64)
            # fused-TTA programs return (2n, K, 6): rows [0,n) are the
            # unflipped halves, [n,2n) the flipped ones
            for idx in range(packed.shape[0]):
                b = idx % n
                flipped = bool(flip) if flip != "both" else idx >= n
                rows = packed[idx][packed[idx, :, 4] >= 0.0]
                if flipped:
                    # scaled valid width, matching preprocess's
                    # float32 ceil(valid_w * rx)
                    w_s = float(np.ceil(np.float32(hws[b][1]) *
                                        np.float32(rx)))
                    rows[:, 0] = w_s - rows[:, 0] - rows[:, 2]
                rows[:, [0, 2]] /= rx
                rows[:, [1, 3]] /= ry
                per_img[b].append(rows)

        # RetinaNet already score-filtered and hard-NMS'd on device
        # (the reference applies no further host NMS,
        # retinanet_operator.py:250-258)
        host_post = cfg.model.name != "retinanet" and not cfg.val.auto_test
        outs = []
        for parts in per_img:
            pred = np.concatenate(parts, axis=0)
            if host_post:
                pred = pred[pred[:, 4] > cfg.val.score_threshold]
            pred = pred[np.argsort(-pred[:, 4], kind="stable")]
            if host_post:
                pred = host_nms.per_class_soft_nms_xywh(
                    pred, Nt=cfg.model.soft_nms.iou_threshold,
                    threshold=cfg.model.soft_nms.score_threshold)
                pred = pred[np.argsort(-pred[:, 4], kind="stable")]
            outs.append(pred)
        return outs

    def predict_batch(self, images) -> List[np.ndarray]:
        return self.collect(self.dispatch_batch(images))

    def predict(self, image: np.ndarray) -> np.ndarray:
        """Single-image convenience wrapper around predict_batch."""
        return self.predict_batch([image])[0]

    # ------------------------------------------------------------------
    def evaluate_split(self, loader, result_dir: Optional[str] = None,
                       max_images: Optional[int] = None,
                       batch_size: int = 4, verbose: bool = True) -> str:
        """Run the val split, writing VisDrone txts (the reference's
        evaluation_process). Images are grouped by shape bucket into
        batches, and host post-processing of batch k overlaps device
        compute of batch k+1 (software pipelining). Returns the result
        dir."""
        result_dir = result_dir or self.cfg.val.result_dir
        os.makedirs(result_dir, exist_ok=True)
        style = ("centernet" if self.cfg.model.name == "centernet"
                 else "rrnet")

        def bucket_of(img):
            return (_round_up(img.shape[0], self.bucket_multiple),
                    _round_up(img.shape[1], self.bucket_multiple))

        from concurrent.futures import ThreadPoolExecutor
        uploader = ThreadPoolExecutor(max_workers=1)

        queues: Dict[Tuple[int, int], List] = {}
        staged = []      # (upload future, names) — transfer in progress
        in_flight = []   # (handle, names) — compute in progress
        done = 0

        def pump():
            """Advance the 3-stage pipeline: upload -> compute -> collect."""
            nonlocal done
            while len(staged) > 1 or (staged and not in_flight):
                fut, names = staged.pop(0)
                in_flight.append((self.dispatch_batch(fut.result()), names))
                if len(in_flight) > 1:
                    done = _drain(in_flight.pop(0), done)

        def flush(q, pad_to: Optional[int] = None):
            names = [it["name"] for it in q]
            imgs = [it["image"] for it in q]
            if pad_to and len(imgs) < pad_to:
                # reuse the already-compiled batch program: pad with
                # copies of the last image, outputs beyond `names` dropped
                imgs = imgs + [imgs[-1]] * (pad_to - len(imgs))
            staged.append((uploader.submit(self._upload, imgs), names))
            pump()

        def _drain(entry, done):
            handle, names = entry
            for name, pred in zip(names, self.collect(handle)):
                save_result(os.path.join(result_dir, name + ".txt"),
                            pred, style=style)
            done += len(names)
            if verbose:
                print(f"\r[{done}]", end="", flush=True)
            return done

        count = 0
        for item in loader:
            if max_images is not None and count >= max_images:
                break
            count += 1
            b = bucket_of(item["image"])
            queues.setdefault(b, []).append(item)
            if len(queues[b]) >= batch_size:
                flush(queues.pop(b))
        for b, q in list(queues.items()):
            # leftovers: pad to the batch size so the compiled batch
            # program is reused (extra outputs discarded)
            flush(q, pad_to=batch_size)
        while staged:
            fut, names = staged.pop(0)
            in_flight.append((self.dispatch_batch(fut.result()), names))
        while in_flight:
            done = _drain(in_flight.pop(0), done)
        uploader.shutdown()
        if verbose:
            print("\n=> Evaluation Done!")
        return result_dir
