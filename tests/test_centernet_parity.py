"""Full-model numerical parity: our flax CenterNet vs the reference's
torch modules (hourglass backbone + CenterNet heads composed exactly as
models/centernet.py does), same weights via convert_detector_params."""

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


def _ref_modules():
    sys.path.insert(0, REFERENCE)
    try:
        import importlib
        hg = importlib.import_module("backbones.hourglass")
        det = importlib.import_module("detectors.centernet_detector")
    finally:
        sys.path.remove(REFERENCE)
    return hg, det


class _RefCenterNet(torch.nn.Module):
    """The reference CenterNet graph (models/centernet.py:8-33) composed
    from the reference's own modules, without its pretrained-load path."""

    def __init__(self, hg, det, num_stacks=1, num_classes=10):
        super().__init__()
        self.num_stacks = num_stacks
        self.backbone = hg.HourglassNet(num_stacks=num_stacks)
        self.hm = det.CenterNetDetector(planes=num_classes,
                                        num_stacks=num_stacks, hm=True)
        self.wh = det.CenterNetWHDetector(planes=1, num_stacks=num_stacks)
        self.reg = det.CenterNetDetector(planes=2, num_stacks=num_stacks,
                                         hm=False)

    def forward(self, x):
        feats = self.backbone(x)
        hms, whs, regs = [], [], []
        for i in range(self.num_stacks):
            f = torch.relu(feats[i])
            hms.append(self.hm(f, i))
            whs.append(self.wh(f, i))
            regs.append(self.reg(f, i))
        return hms, whs, regs


def test_centernet_full_model_parity():
    import jax
    import jax.numpy as jnp

    from rrnet_tpu.models.centernet import CenterNet
    from rrnet_tpu.utils.convert import convert_detector_params

    hg, det = _ref_modules()
    torch.manual_seed(1)
    ref = _RefCenterNet(hg, det, num_stacks=1)
    for sub in ref.modules():
        if isinstance(sub, torch.nn.BatchNorm2d):
            with torch.no_grad():
                sub.running_mean.normal_(0, 0.05)
                sub.running_var.uniform_(0.8, 1.2)
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats, report = convert_detector_params(sd, "centernet",
                                                    num_stacks=1)
    assert report["unexpected"] == [], report["unexpected"][:5]

    ours = CenterNet(num_stacks=1, dtype=jnp.float32)
    x = np.random.RandomState(1).randn(1, 64, 64, 3).astype(np.float32)
    init_vars = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert (len(jax.tree.leaves(params)) ==
            len(jax.tree.leaves(init_vars["params"])))

    hms, whs, regs = ours.apply({"params": params, "batch_stats": stats},
                                jnp.asarray(x), train=False)
    with torch.no_grad():
        r_hms, r_whs, r_regs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    for o, r in ((hms[0], r_hms[0]), (whs[0], r_whs[0]), (regs[0], r_regs[0])):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy().transpose(0, 2, 3, 1),
            atol=5e-3, rtol=1e-3)


def test_stage2_head_parity():
    """RRNet's FasterRCNNDetector (stage-2 regressor) vs ours with
    converted weights (detectors/fasterrcnn_detector.py)."""
    import importlib
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REFERENCE)
    try:
        fr = importlib.import_module("detectors.fasterrcnn_detector")
    finally:
        sys.path.remove(REFERENCE)

    from rrnet_tpu.models.heads import FasterRCNNHead
    from rrnet_tpu.utils import convert

    torch.manual_seed(2)
    ref = fr.FasterRCNNDetector()
    for sub in ref.modules():
        if isinstance(sub, torch.nn.BatchNorm2d):
            with torch.no_grad():
                sub.running_mean.normal_(0, 0.05)
                sub.running_var.uniform_(0.8, 1.2)
    ref.eval()

    sd = {"head_detector." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    # reuse the detector converter's rrnet branch via a minimal dict
    sub_p, sub_s = {}, {}
    for ci in (1, 2, 3):
        sub_p[f"conv{ci}"] = {"kernel": convert.torch_conv_to_flax(
            sd[f"head_detector.top_layer.conv{ci}.weight"])}
        sub_p[f"bn{ci}"] = {"BatchNorm_0": {
            "scale": sd[f"head_detector.top_layer.bn{ci}.weight"],
            "bias": sd[f"head_detector.top_layer.bn{ci}.bias"]}}
        sub_s[f"bn{ci}"] = {"BatchNorm_0": {
            "mean": sd[f"head_detector.top_layer.bn{ci}.running_mean"],
            "var": sd[f"head_detector.top_layer.bn{ci}.running_var"]}}
    w = sd["head_detector.regressor.weight"]
    params = {"top": sub_p,
              "regressor": {"kernel": convert.torch_linear_to_flax(
                  w.reshape(4, 256)),
                  "bias": sd["head_detector.regressor.bias"]}}
    stats = {"top": sub_s}

    head = FasterRCNNHead()
    x = np.random.RandomState(2).randn(7, 3, 3, 256).astype(np.float32)
    out = head.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x), train=False)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               atol=2e-4, rtol=1e-4)
