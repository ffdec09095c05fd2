"""MaskCycleGAN-VC generator, TPU-native.

Capability/numerics parity with the reference Generator
(``/root/reference/mask_cyclegan_vc/model.py:106-280``), re-designed for
TPU: NHWC activations (channels on lanes), float32 norm statistics,
optional masked InstanceNorm for bucketed variable-length inference,
and a single fused XLA computation under jit.

Shape trace (B=batch, M=80 mel bins, T=frames, R=residual_in_channels=256):

    x:(B,M,T), mask:(B,M,T)
    stack([x*mask, mask], channel)              -> (B, M, T, 2)
    conv1 (5,15)/(2,7) x2, true GLU             -> (B, M, T, R/2)
    gated downsample k5 s2 p2                   -> (B, M/2, T/2, R)
    gated downsample k5 s2 p2                   -> (B, M/4, T/4, R)
    2D->1D reshape (channel-major, torch view)  -> (B, T/4, (M/4)*R)
    conv1d k1 + IN ("tfan")                     -> (B, T/4, R)
    6 x residual GLU blocks (k3, R->2R->R)      -> (B, T/4, R)
    conv1d k1 + IN ("tfan")                     -> (B, T/4, (M/4)*R)
    1D->2D reshape                              -> (B, M/4, T/4, R)
    conv k5 p2 -> 4R, pixel-shuffle(2), IN, swish -> (B, M/2, T/2, R)
    conv k5 p2 -> 2R, pixel-shuffle(2), IN, swish -> (B, M, T, R/2)
    conv (5,15)/(2,7) -> 1, squeeze             -> (B, M, T)

The reference's dead code (``Generator.downsample`` model.py:213-224 and the
custom 3D ``PixelShuffle`` model.py:24-37) is intentionally not reproduced —
it allocates no parameters, so checkpoints are unaffected.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from maskcyclegan_vc_tpu.ops.layers import (
    Conv1dT,
    Conv2dT,
    GatedConv2d,
    InstanceNorm,
    SubpixelConv2d,
    _NamedConvParams,
    conv1d_k3_matmul,
    fused_in_glu,
    fused_in_swish,
    instance_norm_apply,
    paired_conv,
    pixel_shuffle_nhwc,
    swish,
)
from maskcyclegan_vc_tpu.ops.tap_conv import tap_conv2d

Dtype = Any


def strided_len(length, kernel: int = 5, stride: int = 2, padding: int = 2):
    """Output length of a torch-style strided conv: floor((L+2p-k)/s)+1."""
    return (length + 2 * padding - kernel) // stride + 1


def time_mask_from_lengths(lengths, width: int):
    """(B,) lengths -> (B, 1, width, 1) {0,1} mask, 1 at valid frames."""
    t = jax.lax.broadcasted_iota(jnp.int32, (1, 1, width, 1), 2)
    return (t < lengths[:, None, None, None]).astype(jnp.float32)


class ResidualBlock(nn.Module):
    """1D residual GLU block (reference ``ResidualLayer``, model.py:40-76).

    (B, L, R) -> conv k3 -> 2R + IN (signal and gate branches), true GLU,
    conv k3 -> R + IN, residual add.
    """

    features: int
    hidden: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    precision: Optional[str] = None
    fused_norms: bool = False
    # Run the k3 convs as 3 shifted dot_generals instead of lax.conv
    # (ops/layers.conv1d_k3_matmul) — perf A/B for the conv-emitter's
    # ~160 TF/s floor on these shapes; numerics are matmul-identical.
    k3_matmul: bool = False

    @nn.compact
    def __call__(self, x, time_mask=None):
        kw = dict(kernel_size=3, strides=1, padding=1, dtype=self.dtype,
                  param_dtype=self.param_dtype, precision=self.precision)
        in_ch = x.shape[-1]
        kshape = (3, in_ch, self.hidden)
        k_h, b_h = _NamedConvParams(kshape, in_ch * 3, self.param_dtype,
                                    name="conv1d_layer")()
        k_g, b_g = _NamedConvParams(kshape, in_ch * 3, self.param_dtype,
                                    name="conv_layer_gates")()
        if self.k3_matmul:
            from flax.linen import dtypes as _fdt2

            kk = jnp.concatenate([k_h, k_g], axis=-1)
            bb = jnp.concatenate([b_h, b_g])
            xx, kk, bb = _fdt2.promote_dtype(x, kk, bb, dtype=self.dtype)
            hg2 = conv1d_k3_matmul(xx, kk, bb, precision=self.precision)
            h, g = hg2[..., : self.hidden], hg2[..., self.hidden:]
        else:
            h, g = paired_conv(x, k_h, b_h, k_g, b_g, strides=1, padding=1,
                               dtype=self.dtype, precision=self.precision,
                               dims=1)
        norm_h = InstanceNorm(self.hidden, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="conv1d_layer_norm")
        norm_g = InstanceNorm(self.hidden, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="conv_layer_gates_norm")
        if self.fused_norms and time_mask is None:
            sh, bh = norm_h.affine()
            sg, bg = norm_g.affine()
            hg = fused_in_glu(h, g, sh, bh, sg, bg).astype(h.dtype)
        else:
            hg = norm_h(h, time_mask) * jax.nn.sigmoid(norm_g(g, time_mask))
        if self.k3_matmul:
            from flax.linen import dtypes as _fdt2

            k_o, b_o = _NamedConvParams((3, self.hidden, self.features),
                                        self.hidden * 3, self.param_dtype,
                                        name="conv1d_out_layer")()
            hg2, k_o, b_o = _fdt2.promote_dtype(hg, k_o, b_o, dtype=self.dtype)
            out = conv1d_k3_matmul(hg2, k_o, b_o, precision=self.precision)
        else:
            out = Conv1dT(self.features, name="conv1d_out_layer", **kw)(hg)
        out = InstanceNorm(self.features, dtype=self.dtype, param_dtype=self.param_dtype,
                           fused=self.fused_norms,
                           name="conv1d_out_layer_norm")(out, time_mask)
        return x + out


class Generator(nn.Module):
    """Mask-guided CycleGAN-VC generator. 24,537,729 params at defaults."""

    n_mels: int = 80
    residual_channels: int = 256
    num_residual_blocks: int = 6
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    precision: Optional[str] = None
    fused_norms: bool = False
    k3_matmul: bool = False  # residual-stack k3 convs as shifted matmuls
    split_gated_conv: bool = False  # downsample conv pairs as separate convs

    @nn.compact
    def __call__(self, x, mask, lengths=None):
        """Apply the generator.

        Args:
          x: (B, n_mels, T) z-normalized mel-spectrogram.
          mask: (B, n_mels, T) frame-fill (FIF) mask, 1 = keep.
          lengths: optional (B,) int32 valid frame counts; when given,
            InstanceNorm uses masked statistics and padded frames are
            zeroed, enabling bucketed variable-length inference under jit.

        Returns:
          (B, n_mels, T) converted mel-spectrogram.
        """
        R = self.residual_channels
        B, M, T = x.shape
        assert M == self.n_mels, f"expected {self.n_mels} mel bins, got {M}"
        flat = (M // 4) * R

        cdt = self.dtype or x.dtype

        tm0 = tm1 = tm2 = tm_up1 = tm_up2 = None
        if lengths is not None:
            # Bucketed variable-length mode: bucket width must be /4-divisible
            # so downsample(x2) then pixel-shuffle(x2) widths line back up.
            assert T % 4 == 0, "masked inference requires T % 4 == 0 (pad to a bucket)"
            l1 = strided_len(lengths)
            l2 = strided_len(l1)
            tm0 = time_mask_from_lengths(lengths, T)
            tm1 = time_mask_from_lengths(l1, T // 2)
            tm2 = time_mask_from_lengths(l2, T // 4)
            # After pixel-shuffle the valid content spans 2*l2 / 4*l2 frames.
            tm_up1 = time_mask_from_lengths(jnp.minimum(2 * l2, T // 2), T // 2)
            tm_up2 = time_mask_from_lengths(jnp.minimum(4 * l2, T), T)

        # (B, M, T, 2): masked mel in channel 0, the mask itself in channel 1
        # (reference model.py:241 — the mask enters as a second input channel).
        # In bucketed mode, zero both channels beyond the valid length so
        # the bucket's tail is indistinguishable from conv zero-padding —
        # this makes the masked forward exactly equal the unpadded one.
        if tm0 is not None:
            valid = tm0[:, 0, :, 0][:, None, :].astype(x.dtype)  # (B,1,T)
            h = jnp.stack([x * mask * valid, mask * valid], axis=-1).astype(cdt)
        else:
            h = jnp.stack([x * mask, mask], axis=-1).astype(cdt)

        conv_kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                       precision=self.precision)

        # Input true-GLU conv pair (model.py:116-126,242) — paired through
        # the tap-matmul formulation (Cin=2 is MXU-starved as lax.conv;
        # pairing doubles the matmul's output width to 2*(R/2) lanes and
        # reads the im2col'd input once).
        from flax.linen import dtypes as _fdt

        kshape1 = (5, 15, 2, R // 2)
        k_a, b_a = _NamedConvParams(kshape1, 2 * 5 * 15, self.param_dtype,
                                    name="conv1")()
        k_g1, b_g1 = _NamedConvParams(kshape1, 2 * 5 * 15, self.param_dtype,
                                      name="conv1_gates")()
        kk = jnp.concatenate([k_a, k_g1], axis=-1)
        bb = jnp.concatenate([b_a, b_g1])
        hh, kk, bb = _fdt.promote_dtype(h, kk, bb, dtype=self.dtype)
        from maskcyclegan_vc_tpu.ops.tap_conv import use_tap_conv

        if use_tap_conv(2, R, (1, 1)):
            ag = tap_conv2d(hh, kk, bb, (2, 7), precision=self.precision)
        else:
            ag = jax.lax.conv_general_dilated(
                hh, kk, (1, 1), [(2, 2), (7, 7)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=self.precision) + bb
        a, g = ag[..., : R // 2], ag[..., R // 2:]
        h = a * jax.nn.sigmoid(g)
        if tm0 is not None:
            h = h * tm0.astype(h.dtype)

        # Gated downsampling (model.py:129-139,245-246).
        h = GatedConv2d(R, (5, 5), (2, 2), (2, 2), name="downSample1",
                        fused=self.fused_norms,
                        split_pair=self.split_gated_conv, **conv_kw)(h, tm1)
        h = GatedConv2d(R, (5, 5), (2, 2), (2, 2), name="downSample2",
                        fused=self.fused_norms,
                        split_pair=self.split_gated_conv, **conv_kw)(h, tm2)

        # 2D -> 1D. Torch flattens channel-major (``view(B, C*H, W)``,
        # model.py:249-251: flat index c*H2 + h). Flattening h-major
        # (h*R + c) instead keeps the channel dim on TPU lanes, so both
        # the flatten here and the inverse below are sublane-only
        # (H2, W2) transposes instead of lane-crossing relayouts
        # (measured ~8x cheaper per pass, round-3 profile); the k=1
        # convs' torch-ordered weight rows/cols and the 5120-wide IN
        # affine are permuted to match, so the computation and every
        # checkpoint stay torch-exact.
        _, H2, W2, _ = h.shape
        h = h.transpose(0, 2, 1, 3).reshape(B, W2, H2 * R)

        tm2_1d = tm2[:, 0] if tm2 is not None else None  # (B, W2, 1)

        k1, b1 = _NamedConvParams((1, flat, R), flat, self.param_dtype,
                                  name="conv2dto1dLayer")()
        k1 = k1[0].reshape(R, H2, R).transpose(1, 0, 2).reshape(flat, R)
        h, k1, b1 = _fdt.promote_dtype(h, k1, b1, dtype=self.dtype)
        h = jax.lax.dot_general(h, k1, (((2,), (0,)), ((), ())),
                                precision=self.precision) + b1
        h = InstanceNorm(R, dtype=self.dtype, param_dtype=self.param_dtype,
                         fused=self.fused_norms,
                         name="conv2dto1dLayer_tfan")(h, tm2_1d)

        for i in range(self.num_residual_blocks):
            h = ResidualBlock(R, 2 * R, name=f"residualLayer{i + 1}",
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              precision=self.precision,
                              fused_norms=self.fused_norms,
                              k3_matmul=self.k3_matmul)(h, tm2_1d)

        k2, b2 = _NamedConvParams((1, R, flat), R, self.param_dtype,
                                  name="conv1dto2dLayer")()
        k2 = k2[0].reshape(R, R, H2).transpose(0, 2, 1).reshape(R, flat)
        b2 = b2.reshape(R, H2).transpose(1, 0).reshape(flat)
        tfan2 = InstanceNorm(flat, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="conv1dto2dLayer_tfan")
        s2, sb2 = tfan2.affine()
        s2 = s2.reshape(R, H2).transpose(1, 0).reshape(flat)
        sb2 = sb2.reshape(R, H2).transpose(1, 0).reshape(flat)
        h, k2, b2 = _fdt.promote_dtype(h, k2, b2, dtype=self.dtype)
        h = jax.lax.dot_general(h, k2, (((2,), (0,)), ((), ())),
                                precision=self.precision) + b2
        h = instance_norm_apply(h, s2, sb2, time_mask=tm2_1d,
                                fused=self.fused_norms, dtype=self.dtype)

        # 1D -> 2D inverse (model.py:270-271: view(B, R, M/4, -1)) — with
        # the h-major flat index this is again a sublane-only transpose.
        h = h.reshape(B, W2, H2, R).transpose(0, 2, 1, 3)  # (B, H2, W2, R)

        # Upsampling: conv -> pixel shuffle -> IN -> swish (model.py:226-237).
        # Fused path: the conv's output channels are weight-permuted to
        # shuffle-major order and one Pallas kernel does shuffle+IN+swish
        # with a single HBM write (ops/pallas/ps_kernel.py) — as XLA HLO
        # the shuffle materializes 6D transpose copies in forward and in
        # every backward pass.
        up1_norm = InstanceNorm(R, dtype=self.dtype, param_dtype=self.param_dtype,
                                name="upSample1_norm")
        if self.fused_norms and tm_up1 is None:
            from maskcyclegan_vc_tpu.ops.layers import _fused_interpret
            from maskcyclegan_vc_tpu.ops.pallas.ps_kernel import subpixel_in_swish

            h = SubpixelConv2d(4 * R, (5, 5), (2, 2), name="upSample1_conv",
                               **conv_kw)(h)
            su, bu = up1_norm.affine()
            h = subpixel_in_swish(h, su, bu, _fused_interpret()).astype(cdt)
        else:
            h = Conv2dT(4 * R, (5, 5), (1, 1), (2, 2), name="upSample1_conv",
                        **conv_kw)(h)
            h = pixel_shuffle_nhwc(h, 2)
            h = swish(up1_norm(h, tm_up1))

        up2_norm = InstanceNorm(R // 2, dtype=self.dtype, param_dtype=self.param_dtype,
                                name="upSample2_norm")
        if self.fused_norms and tm_up2 is None:
            from maskcyclegan_vc_tpu.ops.layers import _fused_interpret
            from maskcyclegan_vc_tpu.ops.pallas.ps_kernel import subpixel_in_swish

            h = SubpixelConv2d(2 * R, (5, 5), (2, 2), name="upSample2_conv",
                               **conv_kw)(h)
            su, bu = up2_norm.affine()
            h = subpixel_in_swish(h, su, bu, _fused_interpret()).astype(cdt)
        else:
            h = Conv2dT(2 * R, (5, 5), (1, 1), (2, 2), name="upSample2_conv",
                        **conv_kw)(h)
            h = pixel_shuffle_nhwc(h, 2)
            h = swish(up2_norm(h, tm_up2))

        out = Conv2dT(1, (5, 15), (1, 1), (2, 7), name="lastConvLayer", **conv_kw)(h)
        out = out[..., 0]  # (B, M, T)
        if tm0 is not None:
            out = out * tm0[:, 0, :, 0][:, None, :].astype(out.dtype)
        return out.astype(jnp.float32)
