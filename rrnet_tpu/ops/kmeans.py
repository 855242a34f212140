"""Device Lloyd k-means (anchor-prior clustering).

Replaces the reference's GPU-torch k-means (`ext/kmeans/kmeans.py:6-36`,
`ext/kmeans/pairwise.py:6-40`, driven by `scripts/kmeans.py`): forgy
init, fixed-iteration Lloyd updates, squared-L2 distances — as one
jittable lax.fori_loop (static iteration count instead of the
reference's convergence loop, which is XLA-friendlier; iters=100
converges far past the reference's tol=1e-4 on anchor-sized data).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pairwise_sq_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(M, D) x (N, D) -> (M, N) squared L2 (pairwise.py:6-28)."""
    diff = a[:, None, :] - b[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(data: jnp.ndarray, k: int, seed: int = 0, iters: int = 100):
    """Lloyd k-means. data: (N, D). Returns (centers (K, D),
    assignment (N,))."""
    n = data.shape[0]
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (k,), replace=False)   # forgy
    centers0 = data[init_idx]

    def body(_, centers):
        d = pairwise_sq_dist(data, centers)          # (N, K)
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=data.dtype)  # (N, K)
        counts = jnp.maximum(onehot.sum(axis=0), 1.0)
        return (onehot.T @ data) / counts[:, None]

    centers = jax.lax.fori_loop(0, iters, body, centers0)
    assign = jnp.argmin(pairwise_sq_dist(data, centers), axis=1)
    return centers, assign


def anchor_priors_from_dataset(loader, k: int = 3, max_batches: int = 200):
    """Collect GT (w, h) from a TrainLoader and cluster — the
    scripts/kmeans.py workflow. Returns sorted (heights, widths)."""
    import numpy as np
    whs = []
    for _ in range(max_batches):
        batch = loader.get_batch()
        m = batch["valid"]
        whs.append(batch["annos"][m][:, 2:4])
    wh = np.concatenate(whs, axis=0)
    hc, _ = kmeans(jnp.asarray(wh[:, 1:2]), k, seed=0)
    wc, _ = kmeans(jnp.asarray(wh[:, 0:1]), k, seed=0)
    return (np.sort(np.asarray(hc).ravel()), np.sort(np.asarray(wc).ravel()))
