"""PatchGAN discriminator, TPU-native.

Parity with the reference Discriminator
(``/root/reference/mask_cyclegan_vc/model.py:283-349``): conv(3x3) + swish
stem, three strided conv+IN+swish downsample blocks, 1x3 output conv with
**sigmoid** (LSGAN is computed on probabilities in this lineage —
train.py:227-232,276-290 — reproduced as-is).

The reference also constructs a ``downSample4`` block (model.py:316-320,
10,488,832 params) that its forward never calls. Those dead parameters
live in reference checkpoints and optimizer state, so we optionally
declare matching parameters (``include_dead_params=True``) purely for
checkpoint-format parity; they are never touched by compute, and the
training stack masks them out of the optimizer (their grads are
identically zero, so dynamics are unchanged either way).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from maskcyclegan_vc_tpu.ops.layers import (
    Conv2dT,
    InstanceNorm,
    fused_in_swish,
    make_torch_bias_init,
    swish,
    torch_conv_kernel_init,
)

Dtype = Any


class DownsampleD(nn.Module):
    """conv2d + IN + swish (reference ``Discriminator.downsample``, model.py:329-338)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[int, int]
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    precision: Optional[str] = None
    fused_norms: bool = False

    @nn.compact
    def __call__(self, x, time_mask=None):
        h = Conv2dT(self.features, self.kernel_size, self.strides, self.padding,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    precision=self.precision, name="convLayer")(x)
        norm = InstanceNorm(self.features, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="norm")
        if self.fused_norms and time_mask is None:
            s_, b_ = norm.affine()
            return fused_in_swish(h, s_, b_).astype(self.dtype or h.dtype)
        return swish(norm(h, time_mask))


class Discriminator(nn.Module):
    """PatchGAN over (B, n_mels, T) mels -> (B, n_mels/8, ceil(T/8)) probabilities.

    16,691,713 params at defaults incl. the dead block; 6,202,881 live.
    """

    residual_channels: int = 256
    include_dead_params: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    precision: Optional[str] = None
    fused_norms: bool = False

    @nn.compact
    def __call__(self, x, time_mask=None, lengths=None):
        """x: (B, n_mels, T) -> (B, ~M/8, ceil(T/8)) patch probabilities.

        ``lengths`` (B,) int32 — or an explicit (B,1,T,1) ``time_mask`` —
        enables bucketed variable-length evaluation: InstanceNorm uses
        masked statistics, invalid activations are zeroed at every stage
        (so stride boundaries see exactly the zero padding an unpadded
        forward implies), and invalid output patches are zeroed. The
        masked forward is EXACT vs. the unpadded forward (pinned by
        tests/test_models.py::test_discriminator_masked_eval_*), the
        same §5.7 contract the generator's ``lengths`` path carries.
        """
        R = self.residual_channels
        if time_mask is None and lengths is not None:
            from maskcyclegan_vc_tpu.models.generator import (
                time_mask_from_lengths,
            )

            time_mask = time_mask_from_lengths(lengths, x.shape[2])
        h = x[..., None].astype(self.dtype or x.dtype)  # (B, M, T, 1)
        if time_mask is not None:
            # Zero padded frames so the bucket tail is indistinguishable
            # from conv zero-padding (masked IN zeroes its own output at
            # invalid positions; the norm-less stem must be zeroed here).
            h = h * time_mask.astype(h.dtype)

        h = Conv2dT(R // 2, (3, 3), (1, 1), (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, precision=self.precision,
                    name="convLayer1")(h)
        h = swish(h)
        if time_mask is not None:
            h = h * time_mask.astype(h.dtype)

        def shrink(tm):
            # stride-2 k3 p1: out = floor((L+1)/2); subsample validity.
            return None if tm is None else tm[:, :, ::2, :]

        tm = time_mask
        tm = shrink(tm)
        h = DownsampleD(R, (3, 3), (2, 2), (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, precision=self.precision,
                        fused_norms=self.fused_norms, name="downSample1")(h, tm)
        tm = shrink(tm)
        h = DownsampleD(2 * R, (3, 3), (2, 2), (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, precision=self.precision,
                        fused_norms=self.fused_norms, name="downSample2")(h, tm)
        tm = shrink(tm)
        h = DownsampleD(4 * R, (3, 3), (2, 2), (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, precision=self.precision,
                        fused_norms=self.fused_norms, name="downSample3")(h, tm)

        if self.include_dead_params:
            # Dead ``downSample4`` parameters (reference model.py:316-320):
            # conv k(1,10) 4R->4R + affine IN. Never applied; kept only so
            # reference checkpoints round-trip bit-exactly.
            dead_fan_in = 4 * R * 1 * 10
            self.param("downSample4_conv_kernel", torch_conv_kernel_init,
                       (1, 10, 4 * R, 4 * R), self.param_dtype)
            self.param("downSample4_conv_bias", make_torch_bias_init(dead_fan_in),
                       (4 * R,), self.param_dtype)
            self.param("downSample4_norm_scale", nn.initializers.ones,
                       (4 * R,), self.param_dtype)
            self.param("downSample4_norm_bias", nn.initializers.zeros,
                       (4 * R,), self.param_dtype)

        h = Conv2dT(1, (1, 3), (1, 1), (0, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, precision=self.precision,
                    name="outputConvLayer")(h)
        out = jax.nn.sigmoid(h.astype(jnp.float32))[..., 0]  # (B, M/8, ceil(T/8))
        if tm is not None:
            out = out * tm[:, 0, :, 0][:, None, :]
        return out
