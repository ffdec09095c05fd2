"""Core neural-net ops, TPU-first.

Layout convention: activations are NHWC / NLC — channels last, so the
channel dim maps onto TPU lanes (128) and convolutions lower onto the MXU
without transposes.  The PyTorch reference uses NCHW throughout
(``/root/reference/mask_cyclegan_vc/model.py``); we only match its
*numerics* (padding conventions, InstanceNorm eps/affine semantics,
gating flavors), not its layout.

Numerics parity notes (vs. reference ``model.py``):
  * Conv: torch ``nn.Conv2d(k, stride, padding=p)`` == XLA conv with
    explicit symmetric padding ``[(ph, ph), (pw, pw)]``.
  * InstanceNorm: per-(sample, channel) stats over spatial dims, biased
    variance, ``eps=1e-5``, affine (scale init 1, bias init 0) — exactly
    torch ``InstanceNorm{1,2}d(affine=True)``.
  * Two gating flavors exist in the reference and both are kept:
    ``swish`` (``x * sigmoid(x)``, the reference's mislabeled "GLU",
    model.py:12-21) and the true two-conv GLU (model.py:74,101-103).
  * PixelShuffle matches torch ``nn.PixelShuffle(2)`` channel ordering
    (model.py:232) translated to NHWC.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import dtypes as flax_dtypes

from maskcyclegan_vc_tpu.ops.tap_conv import tap_conv2d, use_tap_conv

Dtype = Any


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """Torch Conv default init: kaiming_uniform(a=sqrt(5)).

    For flax HWIO kernels ``shape = (*kernel_spatial, in_ch, out_ch)``;
    fan_in = in_ch * prod(kernel_spatial); bound = 1/sqrt(fan_in).
    """
    fan_in = int(shape[-2]) * int(math.prod(shape[:-2]))
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def swish(x):
    """x * sigmoid(x) — the reference's self-gated "GLU" (model.py:12-21)."""
    return x * jax.nn.sigmoid(x)


class _ConvParams(nn.Module):
    """Bare conv kernel/bias params matching ``nn.Conv``'s param tree."""

    kshape: Tuple[int, int, int, int]  # (kh, kw, in_ch, out_ch) HWIO
    fan_in: int
    use_bias: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_conv_kernel_init, self.kshape,
                            self.param_dtype)
        bias = None
        if self.use_bias:
            bias = self.param("bias", make_torch_bias_init(self.fan_in),
                              (self.kshape[-1],), self.param_dtype)
        return kernel, bias


class Conv2dT(nn.Module):
    """2D conv with torch semantics (symmetric explicit padding, torch init).

    Input/output NHWC. Stride-1 convs with tiny channel counts (Cin<=4 or
    Cout<=4 — the generator's conv1 pair/lastConvLayer and the
    discriminator's convLayer1/outputConvLayer) lower through the
    tap-matmul formulation (ops/tap_conv.py) instead of ``lax.conv``: a
    1-2 lane conv runs the 128-wide MXU at ~1% utilization in forward
    AND both gradients, costing ~2.5 ms each on v5e at batch 32x128.
    The param tree is identical either way ({"conv": {kernel, bias}}).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    precision: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        fan_in = in_ch * kh * kw
        if use_tap_conv(in_ch, self.features, self.strides):
            kernel, bias = _ConvParams(
                (kh, kw, in_ch, self.features), fan_in,
                use_bias=self.use_bias, param_dtype=self.param_dtype,
                name="conv")()
            x, kernel, bias = flax_dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype)
            return tap_conv2d(x, kernel, bias, self.padding,
                              precision=self.precision)
        pad = [(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])]
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=self.precision,
            name="conv",
        )(x)


class Conv1dT(nn.Module):
    """1D conv with torch semantics. Input/output (B, L, C)."""

    features: int
    kernel_size: int
    strides: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    precision: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.strides,),
            padding=[(self.padding, self.padding)],
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=self.precision,
            name="conv",
        )(x)


def _fused_interpret():
    import jax

    return jax.default_backend() == "cpu"


def fused_in(x, scale, bias):
    """Pallas fused affine IN on an NHWC/NLC tensor."""
    from maskcyclegan_vc_tpu.ops.pallas.in_gate_kernel import instance_norm_fused

    B, C = x.shape[0], x.shape[-1]
    y = instance_norm_fused(x.reshape(B, -1, C), scale, bias, _fused_interpret())
    return y.reshape(x.shape)


def fused_in_swish(x, scale, bias):
    """Pallas fused swish(IN(x)) on an NHWC/NLC tensor."""
    from maskcyclegan_vc_tpu.ops.pallas.in_gate_kernel import (
        instance_norm_swish_fused,
    )

    B, C = x.shape[0], x.shape[-1]
    y = instance_norm_swish_fused(x.reshape(B, -1, C), scale, bias,
                                  _fused_interpret())
    return y.reshape(x.shape)


def fused_in_glu(h, g, scale_h, bias_h, scale_g, bias_g):
    """Pallas fused IN(h)*sigmoid(IN(g)) on NHWC/NLC tensors."""
    from maskcyclegan_vc_tpu.ops.pallas.in_gate_kernel import (
        instance_norm_glu_fused,
    )

    B, C = h.shape[0], h.shape[-1]
    y = instance_norm_glu_fused(
        h.reshape(B, -1, C), g.reshape(B, -1, C),
        scale_h, bias_h, scale_g, bias_g, _fused_interpret())
    return y.reshape(h.shape)


def _masked_moments(x, time_mask, axes):
    """Mean/var over `axes` counting only positions where time_mask == 1.

    x: (B, ..., C); time_mask broadcastable to x with 1 at valid frames.
    Stats use the biased variance (torch InstanceNorm semantics).
    """
    x32 = x.astype(jnp.float32)
    m = jnp.broadcast_to(time_mask.astype(jnp.float32), x32.shape)
    denom = jnp.maximum(jnp.sum(m, axis=axes, keepdims=True), 1.0)
    mean = jnp.sum(x32 * m, axis=axes, keepdims=True) / denom
    var = jnp.sum(jnp.square(x32 - mean) * m, axis=axes, keepdims=True) / denom
    return mean, var


class InstanceNorm(nn.Module):
    """Affine instance norm over all non-batch, non-channel axes.

    Matches torch ``InstanceNorm{1,2}d(num_features, affine=True)``:
    biased variance, eps 1e-5, scale init 1 / bias init 0
    (reference model.py:52-69,91-99 et al.).

    ``time_mask`` (optional, broadcastable, 1=valid) computes masked
    statistics so padded frames don't pollute per-channel moments —
    needed for bucketed variable-length inference under jit (SURVEY §5.7).
    Stats are always accumulated in float32.
    """

    features: int
    eps: float = 1e-5
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    fused: bool = False

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.features,), self.param_dtype)
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype)

    def affine(self):
        """Expose (scale, bias) for externally-fused epilogues."""
        return self.scale, self.bias

    def __call__(self, x, time_mask=None):
        return instance_norm_apply(
            x, self.scale, self.bias, time_mask=time_mask, fused=self.fused,
            dtype=self.dtype, eps=self.eps)


def instance_norm_apply(x, scale, bias, time_mask=None, fused=False,
                        dtype=None, eps=1e-5):
    """Functional affine instance norm (the ``InstanceNorm`` math with
    explicit affine params — used directly when the caller applies a
    channel permutation to torch-ordered scale/bias)."""
    if fused and time_mask is None:
        return fused_in(x, scale, bias).astype(dtype or x.dtype)
    axes = tuple(range(1, x.ndim - 1))
    if time_mask is None:
        # f32-accumulating reductions on the (possibly bf16) input —
        # no materialized f32 copy of the activation.
        mean = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
        var = jnp.mean(
            jnp.square(x.astype(jnp.float32) - mean),
            axis=axes, keepdims=True,
        )
    else:
        mean, var = _masked_moments(x, time_mask, axes)
    inv = jax.lax.rsqrt(var + eps)
    # Fold affine into one multiply-add: y = x*(inv*scale) + (bias - mean*inv*scale)
    a = inv * scale.astype(jnp.float32)
    b = bias.astype(jnp.float32) - mean * a
    out_dtype = dtype or x.dtype
    y = (x.astype(jnp.float32) * a + b).astype(out_dtype)
    if time_mask is not None:
        y = y * time_mask.astype(out_dtype)
    return y


class _NamedConvParams(nn.Module):
    """Conv params under ``<name>/conv/{kernel,bias}`` — the exact tree
    ``Conv2dT``/``Conv1dT`` declare, for paths that compute with the raw
    kernels instead of calling the conv module."""

    kshape: Tuple[int, ...]
    fan_in: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        return _ConvParams(self.kshape, self.fan_in,
                           param_dtype=self.param_dtype, name="conv")()


def paired_conv(x, kernel_h, bias_h, kernel_g, bias_g, *, strides, padding,
                dtype=None, precision=None, dims=2):
    """Run a true-GLU conv pair as ONE conv with concatenated kernels.

    The two branches read the same input; concatenating the HWIO kernels
    along O turns two half-width matmuls into one full-width MXU matmul
    and halves the input HBM traffic — in the forward and, via autodiff
    of the concat, in both backward passes (dx is one transposed conv on
    the concatenated dy; dW is one conv, then split). The dot products
    are bit-identical to the separate convs.

    Returns (h, g), each with ``kernel_h.shape[-1]`` channels.
    """
    C = kernel_h.shape[-1]
    k = jnp.concatenate([kernel_h, kernel_g], axis=-1)
    b = jnp.concatenate([bias_h, bias_g]) if bias_h is not None else None
    x, k, b = flax_dtypes.promote_dtype(x, k, b, dtype=dtype)
    if dims == 2:
        dn = ("NHWC", "HWIO", "NHWC")
        pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    else:
        dn = ("NHC", "HIO", "NHC")
        pad = [(padding, padding)]
        strides = (strides,) if isinstance(strides, int) else strides
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=strides, padding=pad,
        dimension_numbers=dn, precision=precision)
    if b is not None:
        y = y + b
    return y[..., :C], y[..., C:]


def conv1d_k3_matmul(x, kernel, bias=None, precision=None):
    """k3 stride-1 'same' 1D conv as 3 shifted matmuls (MXU dot_generals).

    x: (B, L, Ci), kernel: (3, Ci, Co) -> (B, L, Co). Bit-compatible with
    ``lax.conv_general_dilated`` at matched precision (each output
    element is the same 3*Ci-term dot product, accumulated tap-major).
    Rationale: the conv emitter runs the residual stack's k3 convs at
    ~160 TF/s (COVERAGE per-op table); expressing them as plain matmuls
    hands XLA the same FLOPs in its best-tuned emitter — and autodiff
    gives dx/dW as matmuls too.
    """
    B, L, Ci = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    y = None
    for t in range(3):
        yt = jax.lax.dot_general(
            jax.lax.slice_in_dim(xp, t, t + L, axis=1), kernel[t],
            (((2,), (0,)), ((), ())), precision=precision)
        y = yt if y is None else y + yt
    return y if bias is None else y + bias


class GatedConv2d(nn.Module):
    """True GLU downsample block: two parallel conv+IN, signal * sigmoid(gate).

    Reference ``DownSampleGenerator`` (model.py:79-103). The two convs
    share the same input read, so they run as one concatenated-kernel
    conv (``paired_conv``); the IN+GLU epilogue optionally fuses into a
    Pallas kernel. Param tree is identical to two separate ``Conv2dT``s.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[int, int]
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    precision: Optional[str] = None
    fused: bool = False
    # Perf A/B: run the signal/gate convs as two separate lax.convs
    # instead of one concatenated-kernel conv (the paired downsample
    # convs measure 158 TF/s vs 174-182 for the best fusions; splitting
    # changes the emitter's output tiling at the cost of a second input
    # read). Numerics identical either way.
    split_pair: bool = False

    @nn.compact
    def __call__(self, x, time_mask=None):
        kh, kw_ = self.kernel_size
        in_ch = x.shape[-1]
        fan_in = in_ch * kh * kw_
        kshape = (kh, kw_, in_ch, self.features)
        k_h, b_h = _NamedConvParams(kshape, fan_in, self.param_dtype,
                                    name="convLayer")()
        k_g, b_g = _NamedConvParams(kshape, fan_in, self.param_dtype,
                                    name="convLayer_gates")()
        if self.split_pair:
            pad = [(self.padding[0], self.padding[0]),
                   (self.padding[1], self.padding[1])]

            def one(k, b):
                xx, kk, bb = flax_dtypes.promote_dtype(
                    x, k, b, dtype=self.dtype)
                return jax.lax.conv_general_dilated(
                    xx, kk, self.strides, pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=self.precision) + bb

            h, g = one(k_h, b_h), one(k_g, b_g)
        else:
            h, g = paired_conv(x, k_h, b_h, k_g, b_g, strides=self.strides,
                               padding=self.padding, dtype=self.dtype,
                               precision=self.precision, dims=2)
        norm_h = InstanceNorm(self.features, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="convLayer_norm")
        norm_g = InstanceNorm(self.features, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="convLayer_gates_norm")
        if self.fused and time_mask is None:
            sh, bh = norm_h.affine()
            sg, bg = norm_g.affine()
            return fused_in_glu(h, g, sh, bh, sg, bg).astype(
                self.dtype or h.dtype)
        h = norm_h(h, time_mask)
        g = norm_g(g, time_mask)
        return h * jax.nn.sigmoid(g)


class SubpixelConv2d(nn.Module):
    """Conv whose output channels are permuted to pixel-shuffle-major order.

    Declares torch-ordered params (identical tree to ``Conv2dT``:
    {"conv": {kernel, bias}}, PixelShuffle channel c*4 + (2i+j)) but
    computes with the Cout axis permuted to ``(2i+j)*C + c`` so the
    downstream fused shuffle kernel (ops/pallas/ps_kernel.py) reads each
    sub-position as a contiguous lane slice. The permutation is a
    weight-sized gather that XLA folds into the conv's weight prep.

    Output: (B, H, W, 4C) q-major — feed to ``subpixel_in_swish``.
    """

    features: int  # conv output channels = 4*C
    kernel_size: Tuple[int, int]
    padding: Tuple[int, int]
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    precision: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        fan_in = in_ch * kh * kw
        kernel, bias = _ConvParams(
            (kh, kw, in_ch, self.features), fan_in,
            use_bias=self.use_bias, param_dtype=self.param_dtype,
            name="conv")()
        C = self.features // 4
        k2 = kernel.reshape(kh, kw, in_ch, C, 4).transpose(
            0, 1, 2, 4, 3).reshape(kh, kw, in_ch, self.features)
        b2 = None
        if bias is not None:
            b2 = bias.reshape(C, 4).transpose(1, 0).reshape(self.features)
        x, k2, b2 = flax_dtypes.promote_dtype(x, k2, b2, dtype=self.dtype)
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x, k2, window_strides=(1, 1),
            padding=[(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.precision,
        )
        return y + b2 if b2 is not None else y


def pixel_shuffle_nhwc(x, r: int = 2):
    """NHWC pixel shuffle matching torch ``nn.PixelShuffle(r)`` ordering.

    torch (NCHW): out[b, c, h*r+i, w*r+j] = in[b, c*r*r + i*r + j, h, w].
    Here x: (B, H, W, C*r*r) -> (B, H*r, W*r, C).
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)
