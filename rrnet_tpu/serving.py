"""Latency-oriented serving surface: pre-compiled single-image inference
plus dynamic micro-batching for request streams.

The reference framework is batch/offline only — its eval loop loads a
checkpoint and sweeps the val split (operators/rrnet_operator.py:246-284);
there is no deployment story. This module rounds the TPU framework out
for production serving:

  * `Predictor` — deployment-setting inference (single scale, no TTA,
    per configs/rrnet_config.py:82's deployment intent) with an explicit
    `warmup()` that pre-compiles the per-bucket XLA programs and primes
    the staging scratch, so the first real request pays no compile. All
    device-side preprocessing, forward, decode and the host soft-NMS are
    reused from `evallib.infer.Evaluator` — serving and offline eval can
    never diverge.
  * `MicroBatcher` — a server-style dynamic batcher: concurrent requests
    that arrive within `max_delay_ms` of each other are grouped (by
    shape bucket) into one device program call, trading a bounded queue
    delay for batched MXU utilization. Each `submit()` returns a
    `concurrent.futures.Future` resolving to the same (N, 6) detections
    `Predictor.predict` yields.

Throughput-oriented offline sweeps should keep using
`Evaluator.evaluate_split` (software-pipelined, bucket-grouped batches);
this module optimizes time-to-first-detection for online traffic.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from rrnet_tpu.config import Config
from rrnet_tpu.evallib.infer import Evaluator, _round_up

__all__ = ["Predictor", "MicroBatcher"]


class Predictor:
    """Single-request detector serving a trained model at deployment
    settings.

    Parameters
    ----------
    cfg, variables, model: as for `Evaluator`.
    deployment: when True (default) the val protocol is forced to the
        deployment setting — single scale, no flip TTA — regardless of
        the preset's eval-protocol settings (the reference's multi-scale
        sweep is an offline benchmarking protocol, not a serving one).
    image_shapes: (H, W) shapes `warmup()` pre-compiles for. Defaults to
        VisDrone's dominant val shape. Requests at other shapes still
        work; they compile on first use.
    """

    def __init__(self, cfg: Config, variables, model=None,
                 deployment: bool = True,
                 image_shapes: Sequence[Tuple[int, int]] = ((765, 1360),),
                 bucket_multiple: int = 128, decode_topk: int = 250,
                 latency_window: int = 256,
                 quantize: Optional[str] = None):
        if deployment:
            cfg = cfg.replace(
                val=dataclasses.replace(cfg.val, scales=(1.0,),
                                        flip_tta=False))
        self.cfg = cfg
        self.image_shapes = [tuple(s) for s in image_shapes]
        self._ev = Evaluator(cfg, variables, model=model,
                             bucket_multiple=bucket_multiple,
                             decode_topk=decode_topk, quantize=quantize)
        self._latencies = deque(maxlen=latency_window)
        self._lock = threading.Lock()
        self.warmed_up = False

    # -- lifecycle ------------------------------------------------------
    def warmup(self, image_shapes: Optional[Iterable[Tuple[int, int]]] = None,
               batch_sizes: Sequence[int] = (1,)) -> int:
        """Pre-compile programs for every (image shape, batch size) and
        prime the staging scratch. Returns the number of compiled
        programs afterwards. Warmup uses zero images at the REQUEST
        shape (not the bucket shape): the Evaluator's wire shape is the
        16-rounded image size, so warming at the bucket shape would
        compile a program real requests never hit."""
        if (self._ev.quantize is not None
                and self._ev._quant_scales is None):
            # Warming up an uncalibrated int8 predictor would trigger the
            # Evaluator's lazy first-batch calibration on the all-zero
            # dummies below, silently baking unrepresentative activation
            # scales into every compiled program. Fail loudly instead.
            raise RuntimeError(
                "Predictor(quantize='int8') must be calibrated on "
                "representative images before warmup(): call "
                "calibrate(images) first")
        shapes = [tuple(s) for s in (image_shapes or self.image_shapes)]
        for (h, w) in shapes:
            dummy = np.zeros((h, w, 3), np.uint8)
            for b in batch_sizes:
                self._ev.predict_batch([dummy] * b)
        self.warmed_up = True
        return len(self._ev._compiled)

    def update_variables(self, variables) -> None:
        """Hot-swap weights (new checkpoint). Drops compiled programs —
        call `warmup()` again before serving latency-sensitive traffic."""
        self._ev.update_variables(variables)
        self.warmed_up = False

    def calibrate(self, images) -> dict:
        """For quantize='int8': record activation ranges from
        REPRESENTATIVE images before `warmup()` (warmup's zero dummies
        would otherwise be the calibration set via the Evaluator's
        lazy first-batch calibration)."""
        return self._ev.calibrate(images)

    # -- inference ------------------------------------------------------
    def predict(self, image: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 RGB -> (N, 6) [x, y, w, h, score, cls]
        detections in original pixels, sorted by score."""
        t0 = time.perf_counter()
        out = self._ev.predict(image)
        self._record(time.perf_counter() - t0)
        return out

    def predict_batch(self, images: List[np.ndarray]) -> List[np.ndarray]:
        """Batched variant (images may differ in size within one shape
        bucket; cross-bucket batches are split by the MicroBatcher, not
        here)."""
        t0 = time.perf_counter()
        outs = self._ev.predict_batch(images)
        self._record(time.perf_counter() - t0)
        return outs

    def bucket_of(self, image: np.ndarray) -> Tuple[int, int]:
        return (_round_up(image.shape[0], self._ev.bucket_multiple),
                _round_up(image.shape[1], self._ev.bucket_multiple))

    # -- pipelined phases (used by MicroBatcher) -------------------------
    # Splitting predict_batch into stage/dispatch/collect lets the
    # MicroBatcher overlap the host->device upload of batch k+1 with the
    # device compute of batch k: dispatch() is async (the device executes
    # in the background), so staging the next batch while a handle is in
    # flight puts the wire and the MXU to work simultaneously.
    def stage(self, images: List[np.ndarray]):
        """Upload a same-bucket image list; returns a staged batch."""
        return self._ev._upload(images)

    def dispatch(self, staged):
        """Async-dispatch a staged batch; returns a handle for collect."""
        return self._ev.dispatch_batch(staged)

    def collect(self, handle) -> List[np.ndarray]:
        """Fetch + host post-process a dispatched handle."""
        return self._ev.collect(handle)

    # -- introspection ---------------------------------------------------
    def _record(self, dt: float) -> None:
        with self._lock:
            self._latencies.append(dt)

    def latency_stats(self) -> Dict[str, float]:
        """p50/p90/p99/mean over the trailing request window, seconds."""
        with self._lock:
            lat = np.asarray(self._latencies, np.float64)
        if lat.size == 0:
            return {"count": 0}
        return {"count": int(lat.size),
                "mean_s": float(lat.mean()),
                "p50_s": float(np.percentile(lat, 50)),
                "p90_s": float(np.percentile(lat, 90)),
                "p99_s": float(np.percentile(lat, 99))}


class _Request:
    __slots__ = ("image", "future")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.future: Future = Future()


_STOP = object()


class MicroBatcher:
    """Dynamic micro-batching front-end over a `Predictor`.

    A background worker drains the request queue; after the first
    request of a batch arrives it waits at most `max_delay_ms` for more
    (up to `max_batch`), groups them by shape bucket, and runs one
    batched program call per group. Under load, batches fill instantly
    and the delay bound never binds; at low traffic each request pays at
    most `max_delay_ms` extra.

    The worker keeps up to `pipeline_depth` dispatched batches in
    flight: while batch k computes on the device, batch k+1 is staged
    and its host->device upload runs — so under streaming traffic the
    sustained rate is set by max(upload, compute), not their sum. A
    closed-loop client (each request submitted after the previous
    response) never has two batches in flight, so its latency is
    unchanged.
    """

    def __init__(self, predictor: Predictor, max_batch: int = 8,
                 max_delay_ms: float = 4.0, pipeline_depth: int = 2):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        if pipeline_depth < 1:
            raise ValueError("pipeline_depth must be >= 1")
        self.predictor = predictor
        self.max_batch = int(max_batch)
        self.pipeline_depth = int(pipeline_depth)
        self.max_delay = float(max_delay_ms) / 1e3
        self.batch_sizes: List[int] = []   # observed, for tests/metrics
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        self._worker = threading.Thread(target=self._loop, daemon=True,
                                        name="microbatcher")
        self._worker.start()

    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one image; the Future resolves to (N, 6) detections."""
        if self._closed:
            raise RuntimeError("MicroBatcher is closed")
        req = _Request(image)
        self._q.put(req)
        return req.future

    def close(self, wait: bool = True) -> None:
        """Stop accepting requests; drain the queue, then stop the
        worker."""
        if self._closed:
            return
        self._closed = True
        self._q.put(_STOP)
        if wait:
            self._worker.join()

    def __enter__(self) -> "MicroBatcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- worker ----------------------------------------------------------
    def _collect_batch(self, block: bool = True) -> Tuple[List[_Request], bool]:
        """Gather the next batch of requests: block for the first one
        (or, with block=False, return immediately if none is waiting —
        used while dispatched batches are in flight), then gather more
        until max_batch or the delay deadline. Returns
        (requests, stop_seen)."""
        try:
            first = self._q.get(block=block)
        except queue.Empty:
            return [], False
        if first is _STOP:
            return [], True
        batch = [first]
        deadline = time.monotonic() + self.max_delay
        while len(batch) < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is _STOP:
                return batch, True
            batch.append(nxt)
        return batch, False

    @staticmethod
    def _resolve(fut: Future, result) -> None:
        # set_running_or_notify_cancel() is the race-free guard: it
        # returns False iff the caller cancelled the future, and once it
        # returns True the future can no longer be cancelled, so
        # set_result/set_exception cannot raise InvalidStateError.
        if fut.set_running_or_notify_cancel():
            fut.set_result(result)

    @staticmethod
    def _reject(fut: Future, exc: BaseException) -> None:
        if fut.set_running_or_notify_cancel():
            fut.set_exception(exc)

    def _resolve_group(self, handle, group: List[_Request]) -> None:
        """Collect one in-flight batch and resolve its futures."""
        try:
            preds = self.predictor.collect(handle)
        except Exception as e:  # surface on the futures
            for r in group:
                self._reject(r.future, e)
        else:
            for r, p in zip(group, preds):
                self._resolve(r.future, p)

    def _loop(self) -> None:
        in_flight: deque = deque()   # (handle, group), oldest first
        while True:
            # while batches are in flight, don't block on the queue —
            # take whatever arrived (its upload then overlaps the
            # in-flight compute) or fall through to resolve the oldest
            batch, stop = self._collect_batch(block=not in_flight)
            if batch:
                groups: Dict[Tuple[int, int], List[_Request]] = {}
                for req in batch:
                    # a malformed request (non-array, wrong rank, ...)
                    # must fail ITS future only — never the worker
                    try:
                        bucket = self.predictor.bucket_of(req.image)
                    except Exception as e:
                        self._reject(req.future, e)
                        continue
                    groups.setdefault(bucket, []).append(req)
                for group in groups.values():
                    self.batch_sizes.append(len(group))
                    try:
                        staged = self.predictor.stage(
                            [r.image for r in group])
                        handle = self.predictor.dispatch(staged)
                    except Exception as e:
                        for r in group:
                            self._reject(r.future, e)
                        continue
                    in_flight.append((handle, group))
                    while len(in_flight) >= self.pipeline_depth:
                        self._resolve_group(*in_flight.popleft())
            elif in_flight and not stop:
                # queue idle: finish the oldest in-flight batch
                self._resolve_group(*in_flight.popleft())
            if stop:
                while in_flight:
                    self._resolve_group(*in_flight.popleft())
                # drain anything enqueued before close() won the race
                while True:
                    try:
                        req = self._q.get_nowait()
                    except queue.Empty:
                        return
                    if req is _STOP:
                        continue
                    try:
                        pred = self.predictor.predict(req.image)
                    except Exception as e:
                        self._reject(req.future, e)
                    else:
                        self._resolve(req.future, pred)
