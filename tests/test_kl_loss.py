"""kl_feature_loss parity vs the reference formula.

The reference keeps KLLoss as an unused experiment
(modules/loss/functional.py:60-108; no operator calls it). Our port
implements the loss CORE — the heteroscedastic penalty applied to the
gathered small/large feature sets (reference lines 106-108) — leaving
the index selection to the caller. This test re-implements those exact
lines in torch and checks numerical parity on random features.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from rrnet_tpu.losses import kl_feature_loss  # noqa: E402


def _reference_core(small_alpha, large_alpha, small_feats, large_feats):
    """Verbatim semantics of modules/loss/functional.py:106-108."""
    sa = torch.from_numpy(small_alpha)
    la = torch.from_numpy(large_alpha)
    sf = torch.from_numpy(small_feats)
    lf = torch.from_numpy(large_feats)
    loss = 0.5 * (sa - la) + \
        (la.exp() + F.smooth_l1_loss(sf, lf, reduction="none")) / \
        (2 * sa.exp())
    return float(loss.mean())


@pytest.mark.parametrize("seed,n,c", [(0, 12, 16), (1, 1, 4), (2, 40, 64)])
def test_kl_feature_loss_matches_reference(seed, n, c):
    rng = np.random.RandomState(seed)
    small_alpha = rng.randn(n, c).astype(np.float32)
    large_alpha = rng.randn(n, c).astype(np.float32)
    small_feats = (rng.randn(n, c) * 3).astype(np.float32)
    large_feats = (rng.randn(n, c) * 3).astype(np.float32)

    ref = _reference_core(small_alpha, large_alpha, small_feats, large_feats)
    got = float(kl_feature_loss(
        jnp.asarray(small_alpha), jnp.asarray(large_alpha),
        jnp.asarray(small_feats), jnp.asarray(large_feats)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_kl_feature_loss_zero_when_identical_and_zero_variance():
    """With identical features and equal log-variances a (alpha), the
    smooth-L1 term vanishes and the loss reduces to exp(a)/(2 exp(a))
    = 0.5 exactly — a closed-form anchor independent of torch."""
    a = np.full((5, 8), 0.7, np.float32)
    f = np.random.RandomState(3).randn(5, 8).astype(np.float32)
    got = float(kl_feature_loss(jnp.asarray(a), jnp.asarray(a),
                                jnp.asarray(f), jnp.asarray(f)))
    np.testing.assert_allclose(got, 0.5, rtol=1e-6)
