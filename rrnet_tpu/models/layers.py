"""Shared flax building blocks (NHWC).

TPU-native equivalents of the reference's torch blocks:
  * ConvBN / ConvBNRelu  <- backbones/hourglass.py:43-61 (ConvBNRelu)
  * ResidualBlock        <- backbones/hourglass.py:12-40 (expansion-2
    pre-detector residual with stride-2 downsampling, no pooling)
  * Bottleneck           <- backbones/resnet.py:17-53 (expansion-4)

BatchNorm notes:
  * torch BN(momentum=0.1) == flax BN(momentum=0.9); eps 1e-5.
  * Cross-replica ("Sync") BN — the reference wraps RRNet in
    nn.SyncBatchNorm (operators/rrnet_operator.py:27) — is expressed by
    giving BatchNorm the mesh data-axis name; inside shard_map/pjit the
    batch statistics are then pmean'd over that axis by flax itself.
    `bn_axis=None` reproduces plain per-replica BN (CenterNet/RetinaNet).

Initialization: convs use the torch default kaiming-uniform(a=sqrt(5))
equivalent (variance_scaling(1/3, fan_in, uniform)) so training dynamics
match the reference closely.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen.dtypes import promote_dtype

# torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)),
# i.e. variance 1/(3 fan_in).
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# reference ResNet init (backbones/resnet.py:71-74): normal(0, sqrt(2/n)),
# n = k*k*out_channels == fan_out msra.
msra_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


# ---------------------------------------------------------------------------
# int8 post-training quantization (inference-only, opt-in)
#
# The v5e MXU runs int8 x int8 -> int32 at 394 TOPS vs 197 TFLOP/s bf16.
# Backbone-body convolutions (the ~85% of eval FLOPs that are 3x3/1x1
# convs over >=128-channel features) can run there after a one-off
# calibration pass records per-conv input ranges. Weights are quantized
# per OUTPUT channel, activations per tensor (symmetric, 127 levels);
# the dequant multiply (one per-channel f32 scale) fuses into the conv
# epilogue together with the folded inference BN affine, so the only
# extra memory pass is the int8 requantization of the layer input.
#
# Mechanics: quantization is a TRACE-TIME mode, not a parameter-tree
# change — `quant_context(...)` sets a contextvar that `Conv2d` consults
# while being traced. Checkpoints, converters and the train path are
# untouched. Calibration scales are plain Python floats, baked into the
# compiled program exactly like the Evaluator's folded BN constants.
# ---------------------------------------------------------------------------

_QUANT_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "rrnet_tpu_quant", default=None)


class QuantCtx(NamedTuple):
    mode: str                     # "calibrate" | "int8"
    scales: Optional[dict] = None  # {"/".join(scope path): input absmax}
    min_channels: int = 32        # skip thin-input convs (stem, heads)


@contextlib.contextmanager
def quant_context(mode: str, scales: Optional[dict] = None,
                  min_channels: int = 32):
    """Activate a quantization mode for model traces made inside the
    block. "calibrate": eligible convs sow their input absmax into the
    "quant_stats" collection (pass mutable=["quant_stats"] to apply).
    "int8": eligible convs whose scope path has an entry in `scales`
    run on the int8 MXU path."""
    if mode not in ("calibrate", "int8"):
        raise ValueError(f"unknown quant mode {mode!r}")
    token = _QUANT_CTX.set(QuantCtx(mode, scales, min_channels))
    try:
        yield
    finally:
        _QUANT_CTX.reset(token)


def current_quant() -> Optional[QuantCtx]:
    return _QUANT_CTX.get()


def quant_scales_from_stats(stats) -> dict:
    """Flatten a "quant_stats" collection (or a list of them, from
    several calibration batches) into {scope-path: absmax} floats."""
    import numpy as np
    from jax.tree_util import tree_flatten_with_path

    if not isinstance(stats, (list, tuple)):
        stats = [stats]
    out: dict = {}
    for tree in stats:
        leaves, _ = tree_flatten_with_path(tree)
        for path, leaf in leaves:
            keys = [str(getattr(k, "key", getattr(k, "name", k)))
                    for k in path]
            if keys and keys[-1] == "in_absmax":
                key = "/".join(keys[:-1])
                # sow() reduce may leave a 1-tuple
                val = float(np.max(np.asarray(leaf)))
                out[key] = max(out.get(key, 0.0), val)
    return out


class Conv2d(nn.Module):
    """Drop-in replacement for nn.Conv as used by the body blocks below
    (NHWC, HWIO kernel, same param names/shapes/init — checkpoints and
    converters are unaffected), plus the trace-time int8 path.

    Outside a quant context (and always in training) this computes
    exactly what nn.Conv computes."""
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1
    kernel_init: Callable = torch_conv_init
    bias_init: Callable = nn.initializers.zeros
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        groups = self.feature_group_count
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1] // groups, self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)

        q = current_quant()
        # grouped/depthwise convs stay bf16: too little arithmetic per
        # byte for the int8 MXU path to pay for the requant pass
        eligible = (q is not None and groups == 1
                    and x.shape[-1] >= q.min_channels)
        path = "/".join(self.scope.path) if eligible else None

        if eligible and q.mode == "calibrate":
            self.sow("quant_stats", "in_absmax",
                     jnp.max(jnp.abs(x)).astype(jnp.float32),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.asarray(0.0, jnp.float32))

        if (eligible and q.mode == "int8" and q.scales is not None
                and path in q.scales and q.scales[path] > 0):
            # per-tensor symmetric activation quant; the scale is a
            # trace-time constant from calibration
            s_in = q.scales[path] / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s_in)),
                          -127, 127).astype(jnp.int8)
            # per-output-channel symmetric weight quant, derived from
            # the runtime weights on device (cheap: one reduce over the
            # kernel per call, vs the conv itself)
            wf = kernel.astype(jnp.float32)
            w_absmax = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)),
                                   1e-12)
            s_w = w_absmax / 127.0
            wq = jnp.clip(jnp.round(wf / s_w), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, wq, window_strides=self.strides, padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            # dequant fuses into the conv epilogue with the BN affine
            out_dtype = self.dtype or x.dtype
            y = (y.astype(jnp.float32) * (s_w * s_in)).astype(out_dtype)
            if bias is not None:
                y = y + bias.astype(out_dtype)
            return y

        if bias is not None:
            x, kernel, bias = promote_dtype(x, kernel, bias,
                                            dtype=self.dtype)
        else:
            x, kernel = promote_dtype(x, kernel, dtype=self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=self.strides, padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups)
        if bias is not None:
            y = y + bias
        return y


class _InferenceBN(nn.Module):
    """Inference-mode BN as one folded affine in the ACTIVATION dtype.

    flax's nn.BatchNorm promotes x to f32 at inference (its stats are
    f32 params), leaving a convert -> affine -> convert sandwich that
    XLA cannot fuse into the producing conv's epilogue: at 768x1408
    batch 16 those passes cost ~11 ms of pure HBM traffic (measured,
    PERF.md). Here `mul`/`add` are derived from the same variables in
    f32 (constant-folded at compile time when the Evaluator closes over
    BN stats) and only then cast to x.dtype, so the whole layer is a
    bf16 multiply-add that fuses into the conv.

    Variable names/shapes are exactly nn.BatchNorm's (scale, bias /
    batch_stats mean, var) — checkpoints and converters are unaffected.
    """
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (x.shape[-1],)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(shape, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(shape, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, shape,
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, shape,
                          jnp.float32)
        mul = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
        add = bias - ra_mean.value * mul
        return x * mul.astype(x.dtype) + add.astype(x.dtype)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch-compatible defaults and optional
    cross-replica statistics (SyncBN) via `axis_name`."""
    axis_name: Optional[str] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        if not train:
            # same scope name nn.BatchNorm would auto-take, so the
            # variable tree is identical between the two branches
            return _InferenceBN(epsilon=self.epsilon,
                                name="BatchNorm_0")(x)
        return nn.BatchNorm(
            use_running_average=False,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x)


def _stem_conv_s2d(x, w, dtype):
    """7x7 stride-2 conv on a thin-channel input (the stem), computed as
    2x2 space-to-depth + 4x4 stride-1 conv — EXACT same math.

    A 3-channel conv input pads to the 8-sublane minimum on the MXU,
    wasting >half of every pass (measured: the stem was 6.1 ms of the
    768x1408 eval forward vs a 0.8 ms FLOP floor). Folding the stride
    into the layout quadruples the input channels (3 -> 12) and turns
    the strided 7x7 into a dense 4x4:

        y[i,j] = sum_{u,v} w[u,v] x[2i+u-3, 2j+v-3]
               = sum_{a,dy} w[2a+dy-1+2] x_s2d[i+a-2][dy]   (both axes)

    so w'[a, b, (dy,dx,c)] = w[2a+dy-1, 2b+dx-1, c] (zero where the
    index is -1) with asymmetric padding (2, 1). Parameters keep the
    reference (7,7,C,F) layout, so checkpoints/converters see nothing."""
    h, w_dim = x.shape[1], x.shape[2]
    b, cin = x.shape[0], x.shape[3]
    # space-to-depth: (B, H, W, C) -> (B, H/2, W/2, 4C), channel order
    # (dy, dx, c)
    xs = x.reshape(b, h // 2, 2, w_dim // 2, 2, cin)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w_dim // 2,
                                                4 * cin)
    # kernel remap: w (7,7,C,F) -> w' (4,4,4C,F)
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))   # u' = u+1 = 2a+dy
    wp = wp.reshape(4, 2, 4, 2, cin, w.shape[-1])
    wp = wp.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, w.shape[-1])
    if dtype is not None:
        xs = xs.astype(dtype)
        wp = wp.astype(dtype)
    return jax.lax.conv_general_dilated(
        xs, wp, window_strides=(1, 1), padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _StemConv(nn.Module):
    """Owns the (7,7,C,F) kernel under the same {scope}/kernel name as
    nn.Conv (checkpoint/converter-compatible) but computes the conv via
    the space-to-depth reformulation."""
    features: int
    kernel_init: Callable = torch_conv_init
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", self.kernel_init,
                       (7, 7, x.shape[-1], self.features))
        if x.shape[1] % 2 or x.shape[2] % 2:
            # odd inputs can't space-to-depth; plain strided conv
            xc = x if self.dtype is None else x.astype(self.dtype)
            wc = w if self.dtype is None else w.astype(self.dtype)
            return jax.lax.conv_general_dilated(
                xc, wc, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return _stem_conv_s2d(x, w, self.dtype)


class ConvBN(nn.Module):
    """kxk conv (+BN) (+ReLU). Matches reference ConvBNRelu
    (hourglass.py:43-61): bias only when BN is off."""
    features: int
    kernel: int = 3
    stride: int = 1
    with_bn: bool = True
    with_relu: bool = True
    bn_axis: Optional[str] = None
    dtype: Any = None
    kernel_init: Callable = torch_conv_init

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = Conv2d(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=not self.with_bn,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.with_bn:
            x = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn")(x, train)
        if self.with_relu:
            x = nn.relu(x)
        return x


class ResidualBlock(nn.Module):
    """Hourglass residual block (reference hourglass.py:12-40):
    3x3(s)-BN-relu-3x3-BN with a 1x1(s)-BN skip when shape changes."""
    features: int
    stride: int = 1
    bn_axis: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_features = x.shape[-1]
        out = Conv2d(self.features, (3, 3), strides=(self.stride,) * 2,
                     padding=[(1, 1), (1, 1)], use_bias=False,
                     kernel_init=torch_conv_init, dtype=self.dtype,
                     name="conv1")(x)
        out = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = Conv2d(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                     use_bias=False, kernel_init=torch_conv_init,
                     dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn2")(out, train)

        if self.stride != 1 or in_features != self.features:
            skip = Conv2d(self.features, (1, 1), strides=(self.stride,) * 2,
                          use_bias=False, kernel_init=torch_conv_init,
                          dtype=self.dtype, name="skip_conv")(x)
            skip = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                             name="skip_bn")(skip, train)
        else:
            skip = x
        return nn.relu(out + skip)


class Bottleneck(nn.Module):
    """ResNet bottleneck, expansion 4 (reference resnet.py:17-53)."""
    planes: int
    stride: int = 1
    bn_axis: Optional[str] = None
    dtype: Any = None
    kernel_init: Callable = msra_init

    @nn.compact
    def __call__(self, x, train: bool = False):
        expansion = 4
        in_features = x.shape[-1]
        out_features = self.planes * expansion

        out = Conv2d(self.planes, (1, 1), use_bias=False,
                     kernel_init=self.kernel_init, dtype=self.dtype,
                     name="conv1")(x)
        out = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = Conv2d(self.planes, (3, 3), strides=(self.stride,) * 2,
                     padding=[(1, 1), (1, 1)], use_bias=False,
                     kernel_init=self.kernel_init, dtype=self.dtype,
                     name="conv2")(out)
        out = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = Conv2d(out_features, (1, 1), use_bias=False,
                     kernel_init=self.kernel_init, dtype=self.dtype,
                     name="conv3")(out)
        out = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype, name="bn3")(out, train)

        if self.stride != 1 or in_features != out_features:
            skip = Conv2d(out_features, (1, 1), strides=(self.stride,) * 2,
                          use_bias=False, kernel_init=self.kernel_init,
                          dtype=self.dtype, name="downsample_conv")(x)
            skip = BatchNorm(axis_name=self.bn_axis, dtype=self.dtype,
                             name="downsample_bn")(skip, train)
        else:
            skip = x
        return nn.relu(out + skip)


def max_pool(x, window: int, stride: int, padding: int):
    """torch-style MaxPool2d for NHWC."""
    return nn.max_pool(
        x,
        (window, window),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
    )
