"""Numerical forward parity: our flax HRNet family vs the ACTUAL
reference torch modules, same weights via the converters.

Covers the backbones whose reference loads pretrained torch checkpoints
(backbones/load.py:5-38): pose-HRNet w32 (hrnet.py:269-289),
HRNetV2-w40 (hrnetv2.py:529-541), ShuffleNetV2 (shufflenet.py:174-179).
"""

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


def _ref_module(modname):
    sys.path.insert(0, REFERENCE)
    try:
        import importlib
        return importlib.import_module(modname)
    finally:
        sys.path.remove(REFERENCE)


def _randomize_bn_stats(m):
    for sub in m.modules():
        if isinstance(sub, torch.nn.BatchNorm2d):
            with torch.no_grad():
                sub.running_mean.normal_(0, 0.05)
                sub.running_var.uniform_(0.8, 1.2)


def _check(ref_outs, our_outs, atol=5e-3, rtol=1e-3):
    assert len(ref_outs) == len(our_outs)
    for r, o in zip(ref_outs, our_outs):
        r = r.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(o), r, atol=atol, rtol=rtol)


def test_hrnet_w32_forward_parity():
    import jax
    import jax.numpy as jnp

    from rrnet_tpu.models.backbones.hrnet import HRNetW32
    from rrnet_tpu.utils.convert import convert_hrnet_params

    mod = _ref_module("backbones.hrnet")
    torch.manual_seed(0)
    ref = mod.HRNet(c=32)
    _randomize_bn_stats(ref)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats, report = convert_hrnet_params(sd)
    assert report["unexpected"] == [], report["unexpected"][:5]

    ours = HRNetW32()
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    init_vars = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    n_init = len(jax.tree.leaves(init_vars["params"]))
    n_conv = len(jax.tree.leaves(params))
    assert n_conv == n_init, (n_conv, n_init)

    outs = ours.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    _check(ref_outs, outs)


def test_hrnetv2_w40_forward_parity():
    import jax
    import jax.numpy as jnp

    from rrnet_tpu.models.backbones.hrnetv2 import HRNetV2
    from rrnet_tpu.utils.convert import convert_hrnet_params

    mod = _ref_module("backbones.hrnetv2")
    torch.manual_seed(1)
    ref = mod.HighResolutionNet(mod.extra)
    _randomize_bn_stats(ref)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats, report = convert_hrnet_params(sd)
    assert report["unexpected"] == [], report["unexpected"][:5]

    ours = HRNetV2()
    x = np.random.RandomState(1).randn(1, 64, 64, 3).astype(np.float32)
    init_vars = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    n_init = len(jax.tree.leaves(init_vars["params"]))
    n_conv = len(jax.tree.leaves(params))
    assert n_conv == n_init, (n_conv, n_init)

    outs = ours.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(outs) == 4   # four stride-4 maps (40/80/160/320 ch)
    _check(ref_outs, outs)


def test_shufflenet_forward_parity():
    import jax
    import jax.numpy as jnp

    from rrnet_tpu.models.backbones.shufflenet import ShuffleNetV2
    from rrnet_tpu.utils.convert import convert_shufflenet_params

    mod = _ref_module("backbones.shufflenet")
    torch.manual_seed(2)
    ref = mod.ShuffleNetV2(width_mult=0.5)
    _randomize_bn_stats(ref)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats, report = convert_shufflenet_params(sd)
    assert report["unexpected"] == [], report["unexpected"][:5]

    ours = ShuffleNetV2(width="0.5x")
    x = np.random.RandomState(2).randn(1, 64, 64, 3).astype(np.float32)
    init_vars = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    n_init = len(jax.tree.leaves(init_vars["params"]))
    n_conv = len(jax.tree.leaves(params))
    assert n_conv == n_init, (n_conv, n_init)

    outs = ours.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    _check(list(ref_outs), list(outs))
