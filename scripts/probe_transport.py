"""Characterize the host->device transport path.

The dev rig reaches the TPU through a tunnel whose bandwidth alternates
between ~1.4 GB/s and ~2-45 MB/s in windows of minutes. bench.py's
end-to-end number is transport-bound in slow windows, so its design
(window hunting, trial length, stream count) should follow measured
tunnel behavior, not guesses. This script measures:
  1. single-stream bandwidth vs buffer size
  2. aggregate bandwidth vs number of concurrent device_put threads
  3. window structure over time (repeated probes)

Usage: python scripts/probe_transport.py [--minutes 3]
"""

from __future__ import annotations

import argparse
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def probe(nbytes: int, arrays=None):
    import jax
    buf = arrays if arrays is not None else np.random.randint(
        0, 255, (nbytes,), np.uint8)
    t0 = time.time()
    jax.device_put(buf).block_until_ready()
    dt = time.time() - t0
    return nbytes / 1e6 / dt


def probe_threads(n_threads: int, nbytes_each: int):
    import jax
    bufs = [np.random.randint(0, 255, (nbytes_each,), np.uint8)
            for _ in range(n_threads)]
    with ThreadPoolExecutor(max_workers=n_threads) as ex:
        t0 = time.time()
        futs = [ex.submit(lambda b: jax.device_put(b).block_until_ready(), b)
                for b in bufs]
        [f.result() for f in futs]
        dt = time.time() - t0
    return n_threads * nbytes_each / 1e6 / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=3.0)
    args = ap.parse_args()

    import jax
    print(f"device: {jax.devices()[0]}")

    print("\n# 1. single-stream bandwidth vs buffer size (MB/s)")
    for mb in (1, 4, 16, 64):
        rates = [probe(mb * 1024 * 1024) for _ in range(3)]
        print(f"  {mb:3d} MB: {[round(r, 1) for r in rates]}")

    print("\n# 2. concurrent streams (16 MB each, aggregate MB/s)")
    for nt in (1, 2, 4, 8):
        r = probe_threads(nt, 16 * 1024 * 1024)
        print(f"  {nt} threads: {r:.1f}")

    print("\n# 3. window structure (16 MB single-stream, every 5 s)")
    t_end = time.time() + args.minutes * 60
    while time.time() < t_end:
        r = probe(16 * 1024 * 1024)
        print(f"  t={time.time() % 10000:7.1f}  {r:8.1f} MB/s", flush=True)
        time.sleep(5)


if __name__ == "__main__":
    main()
