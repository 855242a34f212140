"""Detection heads ("detectors" in the reference's naming).

Rebuilds:
  * CenterNetHead   <- detectors/centernet_detector.py:6-23
    (per-stack 3x3 conv-256 (no BN) -> 1x1 conv; heatmap bias -2.19),
  * CenterNetWHHead <- detectors/centernet_detector.py:26-77
    (shared 3x3 conv then asymmetric 17x1 (H) and 1x17 (W) convs with
    W/H-interleaved output channels),
  * FasterRCNNHead  <- detectors/fasterrcnn_detector.py:6-18
    (bottleneck on 3x3 ROI features -> global avg pool -> 4 deltas),
  * RetinaNetHead   <- detectors/retinanet_detector.py:4-15
    (4 x (3x3 conv-256 + relu) + 3x3 output conv).

All heads are NHWC. Per-stack heads take a `stack` index selecting an
independent parameter set, mirroring the reference's ModuleLists.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rrnet_tpu.models.layers import Bottleneck, torch_conv_init


class _ConvParam(nn.Module):
    """Conv kernel+bias parameters without the nn.Conv computation, so
    heads can run the op in a TPU-friendlier formulation while keeping
    the exact same param tree (scope/kernel/bias names and init)."""
    shape: Tuple[int, ...]          # (kh, kw, cin, cout)
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self):
        k = self.param("kernel", torch_conv_init, self.shape)
        b = self.param("bias", self.bias_init, (self.shape[-1],))
        return k, b


class CenterNetHead(nn.Module):
    """Per-stack [3x3 conv-256 (bias, no BN) + relu] -> 1x1 conv head.

    The 1x1 output conv is computed as a matmul (identical math): XLA's
    conv lowering for tiny output-channel counts (10 / 2 classes) wastes
    most of each memory pass, while the dot streams at HBM speed."""
    planes: int
    num_stacks: int = 2
    is_heatmap: bool = False
    mid_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, stack: int):
        x = nn.Conv(self.mid_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=True, kernel_init=torch_conv_init,
                    dtype=self.dtype, name=f"conv{stack}")(x)
        x = nn.relu(x)
        bias_init = (nn.initializers.constant(-2.19) if self.is_heatmap
                     else nn.initializers.zeros)
        ko, bo = _ConvParam((1, 1, self.mid_channels, self.planes),
                            bias_init=bias_init, name=f"out{stack}")()
        return x @ ko[0, 0].astype(x.dtype) + bo.astype(x.dtype)


class CenterNetWHHead(nn.Module):
    """Asymmetric wh head: shared 3x3 conv, then a (k,1) column conv
    predicting H and a (1,k) row conv predicting W, outputs interleaved
    [W0, H0, W1, H1, ...] (reference detectors/centernet_detector.py:47-55:
    torch.cat((W, H), dim=2) after the view — so channel 0 is W).

    TPU formulation: a (k,1)->1 conv is a K=k*C dot with N=1 — the MXU's
    worst case (measured ~9 ms each at 768x1408x16). Instead compute one
    C -> 2*k*planes matmul (each output column = the feature dotted with
    one kernel row/column), then reduce over k shifted row/column slices.
    Identical math (the f32 accumulation is regrouped per tap), one
    memory pass over the feature map for BOTH directions."""
    planes: int = 1
    num_stacks: int = 2
    kernel: int = 17
    mid_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, stack: int):
        k = self.kernel
        p = self.planes
        pad = (k - 1) // 2
        conv = nn.Conv(self.mid_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       use_bias=True, kernel_init=torch_conv_init,
                       dtype=self.dtype, name=f"conv{stack}")(x)
        conv = nn.relu(conv)

        kh, bh = _ConvParam((k, 1, self.mid_channels, p),
                            name=f"hconv{stack}")()
        kw, bw = _ConvParam((1, k, self.mid_channels, p),
                            name=f"wconv{stack}")()
        # (C, k*p) per direction: column dy*p+j == kernel tap dy, plane j
        mh = kh[:, 0].transpose(1, 0, 2).reshape(self.mid_channels, k * p)
        mw = kw[0].transpose(1, 0, 2).reshape(self.mid_channels, k * p)
        m = jnp.concatenate([mh, mw], axis=1).astype(conv.dtype)
        t = conv @ m                                    # (B, H, W, 2kp)
        bsz, hh, ww = t.shape[:3]
        th = t[..., :k * p].reshape(bsz, hh, ww, k, p).astype(jnp.float32)
        tw = t[..., k * p:].reshape(bsz, hh, ww, k, p).astype(jnp.float32)

        thp = jnp.pad(th, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
        h = sum(thp[:, dy:dy + hh, :, dy, :] for dy in range(k))
        twp = jnp.pad(tw, ((0, 0), (0, 0), (pad, pad), (0, 0), (0, 0)))
        w = sum(twp[:, :, dx:dx + ww, dx, :] for dx in range(k))
        h = (h + bh).astype(conv.dtype)
        w = (w + bw).astype(conv.dtype)

        # interleave: (..., planes, 2) -> (..., 2*planes), order W then H
        out = jnp.stack([w, h], axis=-1)
        return out.reshape(out.shape[:-2] + (2 * p,))


class FasterRCNNHead(nn.Module):
    """RRNet stage-2 regression head: Bottleneck(256->64x4) on the 3x3
    ROI feature, global average pool, 1x1 conv to 4 deltas."""
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feat, train: bool = False):
        # roi_feat: (..., 3, 3, 256)
        x = Bottleneck(planes=64, bn_axis=self.bn_axis, dtype=self.dtype,
                       name="top")(roi_feat, train)
        x = jnp.mean(x, axis=(-3, -2))                 # adaptive avg pool 1x1
        return nn.Dense(4, kernel_init=torch_conv_init, dtype=self.dtype,
                        name="regressor")(x)


class RetinaNetHead(nn.Module):
    """Shared conv tower: 4 x (3x3 conv-256 + relu) + 3x3 output conv."""
    planes: int
    mid_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = nn.Conv(self.mid_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=True, kernel_init=torch_conv_init,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        return nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                       use_bias=True, kernel_init=torch_conv_init,
                       dtype=self.dtype, name="out")(x)
