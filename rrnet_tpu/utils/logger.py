"""Training logger (reference utils/vis/logger.py:9-92).

Process-0-gated logging: scalars (+ optional image grids) to
TensorBoard, every line mirrored to `{log_dir}/{prefix}/log.txt` and
stdout with elapsed/ETA stamps. TensorBoard is optional — when no
writer backend is importable the logger degrades to text, and training
never depends on it.

Adds what the reference lacked (SURVEY §5): jax.profiler trace hooks
(`start_trace`/`stop_trace`) for device-level profiling.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

from rrnet_tpu.utils.timer import Timer


def _make_tb_writer(log_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter  # type: ignore
        return SummaryWriter(log_dir)
    except Exception:
        return None


class Logger:
    def __init__(self, cfg, main_process: bool = True):
        self.cfg = cfg
        self.main_process = main_process
        self.log_dir = os.path.join(cfg.log_dir, cfg.log_prefix)
        self.timer = Timer()
        self._tb = None
        if main_process:
            os.makedirs(self.log_dir, exist_ok=True)
            if cfg.use_tensorboard:
                self._tb = _make_tb_writer(self.log_dir)
            self._txt = open(os.path.join(self.log_dir, "log.txt"), "a")
        else:
            self._txt = None

    def init_timer(self, total_steps: int):
        self.timer.start(total_steps)

    # ------------------------------------------------------------------
    def log(self, data: Dict, step: int):
        """data: {'scalar': {tag: value}, 'imgs': {tag: [HWC arrays]}}."""
        if not self.main_process:
            return
        scalars = data.get("scalar", {})
        stamp = self.timer.stamp(step)
        line = f"{stamp} step {step}: " + " ".join(
            f"{k}={float(v):.5f}" for k, v in scalars.items())
        print(line, flush=True)
        if self._txt is not None:
            self._txt.write(line + "\n")
            self._txt.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)
            for tag, imgs in data.get("imgs", {}).items():
                for i, img in enumerate(imgs):
                    self._tb.add_image(f"{tag}/{i}", img, step,
                                       dataformats="HWC")

    # ------------------------------------------------------------------
    def start_trace(self):
        """Capture a jax.profiler device trace under the log dir."""
        import jax
        jax.profiler.start_trace(os.path.join(self.log_dir, "profile"))

    def stop_trace(self):
        import jax
        jax.profiler.stop_trace()

    def close(self):
        if self._txt is not None:
            self._txt.close()
        if self._tb is not None:
            self._tb.close()
