"""Input pipeline: fixed-shape batches with background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler +
pad-to-batch-max collate (`datasets/__init__.py`, `datasets/dataloader.py`,
`datasets/drones_det.py:56-94`) with a TPU-first design:

  * static shapes — annotations are padded/truncated to a fixed
    `max_objects` capacity per image (one compiled program, no
    recompiles on batch-max changes);
  * per-process sharding by `jax.process_index()` stride, per-epoch
    reshuffle by folding the epoch into the numpy seed (the TPU-native
    `DistributedSampler.set_epoch`);
  * iteration-based semantics: `get_batch()` never raises StopIteration,
    it restarts and reshuffles (datasets/dataloader.py:27-37);
  * a small thread pool maps the transform pipeline ahead of the train
    step so host augmentation overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from rrnet_tpu.config import Config
from rrnet_tpu.data import transforms as T
from rrnet_tpu.data.visdrone import VisDroneDataset


def pad_annotations(annos: np.ndarray, max_objects: int):
    """(N, 8) -> ((max_objects, 8), (max_objects,) bool). Overflow keeps
    the largest-area boxes (better than silent head-truncation for
    crowded drone scenes)."""
    n = len(annos)
    out = np.zeros((max_objects, 8), np.float32)
    valid = np.zeros((max_objects,), bool)
    if n == 0:
        return out, valid
    if n > max_objects:
        order = np.argsort(-(annos[:, 2] * annos[:, 3]))
        annos = annos[order[:max_objects]]
        n = max_objects
    out[:n] = annos[:n]
    valid[:n] = True
    return out, valid


class TrainLoader:
    """Infinite iteration-based loader over the training split."""

    def __init__(self, cfg: Config, batch_size: int,
                 dataset: Optional[VisDroneDataset] = None,
                 num_threads: Optional[int] = None,
                 process_index: int = 0, process_count: int = 1,
                 prefetch: int = 4):
        self.cfg = cfg
        self.batch_size = batch_size
        self.dataset = dataset or VisDroneDataset(
            cfg.data_root, "train", with_road_map=cfg.train.with_road)
        self.process_index = process_index
        self.process_count = process_count
        self.max_objects = cfg.train.max_objects
        self.epoch = 0
        self._perm_pos = 0
        self._perm = self._epoch_permutation()
        self._stop = threading.Event()
        self._queue: "queue.Queue[Dict]" = queue.Queue(maxsize=prefetch)
        n_threads = num_threads if num_threads is not None else cfg.train.num_workers
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(n_threads, 1))
        ]
        self._lock = threading.Lock()
        self._sample_counter = 0
        for t in self._threads:
            t.start()

    # -- index scheduling ---------------------------------------------------
    def _epoch_permutation(self) -> np.ndarray:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.cfg.seed, self.epoch]))
        perm = rng.permutation(len(self.dataset))
        # per-process strided shard (DistributedSampler equivalent)
        return perm[self.process_index::self.process_count]

    def _next_index(self):
        with self._lock:
            if self._perm_pos >= len(self._perm):
                self.epoch += 1
                self._perm = self._epoch_permutation()
                self._perm_pos = 0
            idx = int(self._perm[self._perm_pos])
            self._perm_pos += 1
            seed = self._sample_counter
            self._sample_counter += 1
            return idx, seed

    # -- workers ------------------------------------------------------------
    def _load_one(self, idx: int, seed: int) -> Dict:
        sample = self.dataset[idx]
        rng = np.random.default_rng(
            np.random.SeedSequence([self.cfg.seed, 977, seed]))
        sample = T.train_pipeline(sample, rng, self.cfg)
        annos, valid = pad_annotations(sample["annos"], self.max_objects)
        return {"image": sample["image"], "annos": annos, "valid": valid}

    def _worker(self):
        while not self._stop.is_set():
            idx, seed = self._next_index()
            try:
                item = self._load_one(idx, seed)
            except Exception as e:   # mirror the reference's skip-on-error
                print(f"[loader] sample {idx} failed: {e!r}")
                continue
            while not self._stop.is_set():
                try:
                    self._queue.put(item, timeout=0.5)
                    break
                except queue.Full:
                    continue

    # -- public -------------------------------------------------------------
    def get_batch(self) -> Dict[str, np.ndarray]:
        items = [self._queue.get() for _ in range(self.batch_size)]
        images = np.stack([i["image"] for i in items])
        if (images.dtype == np.uint8
                and getattr(self.cfg.train, "transport", "rgb") == "yuv420"):
            # packed (B, 1.5*H*W) wire rows; the train step reconstructs
            # RGB on device (trainer.py) — half the host->device bytes
            from rrnet_tpu.data.yuv420 import pack_yuv420
            images = pack_yuv420(images)
        return {
            "images": images,
            "annos": np.stack([i["annos"] for i in items]),
            "valid": np.stack([i["valid"] for i in items]),
        }

    def close(self):
        self._stop.set()


class DevicePrefetcher:
    """Wraps a TrainLoader: a background thread assembles batches AND
    stages them onto the mesh (device_put), so the host->device transfer
    of batch k+1 overlaps device compute of batch k. `get_batch()`
    returns already-sharded device arrays."""

    def __init__(self, loader: TrainLoader, shard_fn, depth: int = 2):
        self.loader = loader
        self.shard_fn = shard_fn
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            batch = self.shard_fn(self.loader.get_batch())
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def get_batch(self):
        return self._queue.get()

    def close(self):
        self._stop.set()
        self.loader.close()


class ValLoader:
    """Sequential eval loader (batch 1, full-size raw uint8 images —
    normalization happens on device inside the Evaluator; names preserved
    for the VisDrone txt writer)."""

    def __init__(self, cfg: Config, dataset: Optional[VisDroneDataset] = None,
                 split: str = "val"):
        self.cfg = cfg
        self.dataset = dataset or VisDroneDataset(cfg.data_root, split,
                                                  with_road_map=False)

    def __len__(self):
        return len(self.dataset)

    def __iter__(self) -> Iterator[Dict]:
        from rrnet_tpu.data.visdrone import parse_annotation_file
        import os
        for name in self.dataset.names:
            image = self.dataset.load_image(name)   # uint8 HWC
            annos = parse_annotation_file(os.path.join(
                self.dataset.annotations_dir, name + ".txt"))
            yield {"name": name, "image": image, "annos": annos}


def make_loaders(cfg: Config, global_batch_size: Optional[int] = None):
    """(train, val) loader pair — the make_dataloader equivalent
    (datasets/__init__.py:10-36)."""
    import jax
    bs = global_batch_size or cfg.train.batch_size
    train = TrainLoader(cfg, bs,
                        process_index=jax.process_index(),
                        process_count=jax.process_count())
    val = ValLoader(cfg)
    return train, val
