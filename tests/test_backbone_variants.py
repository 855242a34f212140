"""Coverage for the less-common backbone variants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rrnet_tpu.models.backbones import get_backbone

pytestmark = pytest.mark.slow


def run(bb, x):
    variables = bb.init(jax.random.PRNGKey(0), x, train=False)
    return bb.apply(variables, x, train=False), variables


def test_dense_hourglass_stacks():
    bb = get_backbone("dense_hourglass", num_stacks=2)
    x = jnp.zeros((1, 64, 64, 3))
    outs, _ = run(bb, x)
    assert len(outs) == 2
    assert outs[0].shape == (1, 16, 16, 256)


def test_se_hourglass():
    bb = get_backbone("se_hourglass", num_stacks=1)
    x = jnp.zeros((1, 64, 64, 3))
    outs, variables = run(bb, x)
    assert outs[0].shape == (1, 16, 16, 256)
    # SE layers present
    names = str(jax.tree_util.tree_structure(variables["params"]))
    assert "se" in names


def test_trident_plain():
    bb = get_backbone("trires50")
    x = jnp.zeros((1, 64, 64, 3))
    (l1, l2, l3, l4), _ = run(bb, x)
    # trident stage concatenates 3 branches along batch
    assert l1.shape[0] == 1
    assert l3.shape[0] == 3
    assert l4.shape[0] == 3
    assert l3.shape[-1] == 1024
    assert l4.shape[-1] == 2048


def test_trident_deform():
    """The deformable trident path exercises ops.dcn through the shared
    dilated kernel."""
    bb = get_backbone("trires50deform")
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                    jnp.float32)
    (l1, l2, l3, l4), variables = run(bb, x)
    assert l3.shape[0] == 3
    assert np.isfinite(np.asarray(l4)).all()
    # offset convs are zero-init -> deform output equals zero-offset conv;
    # all-ones-mask is NOT identity (sigmoid(0)=0.5 mask) — just check
    # the offset params exist
    names = str(jax.tree_util.tree_structure(variables["params"]))
    assert "offset_mask" in names


def test_shufflenet_widths():
    for width, last in (("0.5x", 1024), ("2.0x", 2048)):
        bb = get_backbone(f"shufflenet_{width}")
        x = jnp.zeros((1, 64, 64, 3))
        outs, _ = run(bb, x)
        assert outs[-1].shape[-1] == last
