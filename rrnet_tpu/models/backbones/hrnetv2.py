"""HRNetV2-w40 backbone (reference backbones/hrnetv2.py:322-541).

Thin preset over the shared HRNet machinery: base width 40, the final
exchange module keeps all four branches, and all branches are upsampled
to stride 4 so the model returns four stride-4 maps with channels
(40, 80, 160, 320). `norm_eval=True` reproduces the reference's frozen-BN
training trick (hrnetv2.py:520-527).
"""

from __future__ import annotations

from typing import Any, Optional

from rrnet_tpu.models.backbones.hrnet import _HRNetBase


def HRNetV2(norm_eval: bool = True, bn_axis: Optional[str] = None,
            dtype: Any = None, **kw):
    return _HRNetBase(
        base_channels=40,
        stage_modules=(1, 4, 3),
        last_multi_scale=True,
        norm_eval=norm_eval,
        bn_axis=bn_axis,
        dtype=dtype,
        **kw,
    )
