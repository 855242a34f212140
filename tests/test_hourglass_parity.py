"""Numerical forward parity: our flax HourglassNet vs the ACTUAL
reference torch HourglassNet, same weights via the converter."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REFERENCE),
                       reason="reference checkout not present"),
]


def _load_ref_hourglass(num_stacks=1):
    sys.path.insert(0, REFERENCE)
    try:
        import importlib
        mod = importlib.import_module("backbones.hourglass")
    finally:
        sys.path.remove(REFERENCE)
    torch.manual_seed(0)
    m = mod.HourglassNet(num_stacks=num_stacks)
    # shrink running-stats noise: re-init BN stats to something nontrivial
    for sub in m.modules():
        if isinstance(sub, torch.nn.BatchNorm2d):
            with torch.no_grad():
                sub.running_mean.normal_(0, 0.05)
                sub.running_var.uniform_(0.8, 1.2)
    m.eval()
    return m


def test_hourglass_forward_parity():
    import jax
    import jax.numpy as jnp

    from rrnet_tpu.models.backbones.hourglass import HourglassNet
    from rrnet_tpu.utils.convert import convert_hourglass_params

    ref = _load_ref_hourglass(num_stacks=2)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats, report = convert_hourglass_params(sd, num_stacks=2)
    assert report["unexpected"] == [], report["unexpected"][:5]

    ours = HourglassNet(num_stacks=2)
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    init_vars = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    # converted tree must cover the whole init tree
    n_init = len(jax.tree.leaves(init_vars["params"]))
    n_conv = len(jax.tree.leaves(params))
    assert n_conv == n_init, (n_conv, n_init)

    outs = ours.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)

    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    assert len(outs) == len(ref_outs) == 2
    for o, r in zip(outs, ref_outs):
        r = r.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(o), r, atol=5e-3, rtol=1e-3)
