"""Backbone registry — TPU-native equivalent of reference
`utils/model_tools.py:9-33` (string -> backbone factory).

Every backbone returns a *list* of NHWC feature maps; stacked backbones
(hourglass family) return one stride-4 map per stack, pyramid backbones
(resnet / shufflenet) return their multi-scale tuple, HRNet returns a
single stride-4 map.
"""

from __future__ import annotations

from typing import Any, Optional

from rrnet_tpu.models.backbones.resnet import ResNet, resnet10, resnet50, resnet101
from rrnet_tpu.models.backbones.hourglass import HourglassNet
from rrnet_tpu.models.backbones.hrnet import HRNetW48, HRNetW32
from rrnet_tpu.models.backbones.hrnetv2 import HRNetV2
from rrnet_tpu.models.backbones.shufflenet import ShuffleNetV2
from rrnet_tpu.models.backbones.trident import TridentResNet


def get_backbone(name: str, num_stacks: int = 2,
                 bn_axis: Optional[str] = None, dtype: Any = None,
                 module_name: str = "backbone"):
    """Build a backbone module by name (reference utils/model_tools.py:9-33).

    Pretrained-weight loading is a separate concern here — see
    rrnet_tpu.utils.convert (torch checkpoint -> flax params)."""
    if name == "resnet10":
        return resnet10(bn_axis=bn_axis, dtype=dtype, name=module_name)
    if name == "resnet50":
        return resnet50(bn_axis=bn_axis, dtype=dtype, name=module_name)
    if name == "resnet101":
        return resnet101(bn_axis=bn_axis, dtype=dtype, name=module_name)
    if name == "hourglass":
        return HourglassNet(num_stacks=num_stacks, bn_axis=bn_axis,
                            dtype=dtype, name=module_name)
    if name == "tiny_hourglass":
        # reduced-depth variant for tests / fast iteration (not in the
        # reference; same topology, fewer levels/channels)
        return HourglassNet(num_stacks=num_stacks, depth=2,
                            inplanes=(64, 64, 96), layer_nums=(1, 1, 1),
                            num_feats=64, bn_axis=bn_axis, dtype=dtype,
                            name=module_name)
    if name == "dense_hourglass":
        return HourglassNet(num_stacks=num_stacks, dense=True,
                            bn_axis=bn_axis, dtype=dtype, name=module_name)
    if name == "se_hourglass":
        return HourglassNet(num_stacks=num_stacks, se=True, pool_stem=True,
                            bn_axis=bn_axis, dtype=dtype, name=module_name)
    if name == "hrnet":
        return HRNetW48(bn_axis=bn_axis, dtype=dtype, name=module_name)
    if name == "hrnet32":
        return HRNetW32(bn_axis=bn_axis, dtype=dtype, name=module_name)
    if name == "hrnetv2":
        return HRNetV2(bn_axis=bn_axis, dtype=dtype, name=module_name)
    if name.startswith("shufflenet"):
        mult = name.split("_")[1] if "_" in name else "1.0x"
        return ShuffleNetV2(width=mult, bn_axis=bn_axis, dtype=dtype,
                            name=module_name)
    if name.startswith("trires"):
        depth = 101 if "101" in name else 50
        return TridentResNet(depth=depth, deform="deform" in name,
                             bn_axis=bn_axis, dtype=dtype, name=module_name)
    # reference falls back to resnet50 for unknown names
    return resnet50(bn_axis=bn_axis, dtype=dtype, name=module_name)
