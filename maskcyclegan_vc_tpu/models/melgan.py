"""MelGAN vocoder generator in JAX + torch-checkpoint weight converter.

The reference decodes mels to waveforms with the pretrained
``descriptinc/melgan-neurips`` torch.hub generator
(``/root/reference/mask_cyclegan_vc/utils.py:25-39``, ``train.py:46-47``).
This module reimplements that generator natively (NLC layout, jittable,
batched) so decode runs on-TPU in the training loop, plus a converter
that folds torch ``weight_norm`` (g, v) pairs into plain kernels so the
published checkpoint is bit-usable.

Architecture (melgan-neurips defaults: ngf=32, n_residual_layers=3,
upsample ratios 8,8,2,2 — 256x upsampling = the mel hop length):

    refl_pad(3) -> conv7 80->512
    for r in (8, 8, 2, 2):
        leaky_relu(0.2) -> conv_transpose(k=2r, s=r, p=ceil(r/2)+?)
        3 x ResnetBlock(dilation=3**j): lrelu, refl_pad(d), conv3 dil=d,
                                        lrelu, conv1  (+ conv1 shortcut)
    leaky_relu -> refl_pad(3) -> conv7 ngf->1 -> tanh

Output length = T * 256.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LRELU_SLOPE = 0.2
RATIOS = (8, 8, 2, 2)


def leaky_relu(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


def reflect_pad_t(x, p: int):
    """Reflection-pad the time axis of (B, L, C)."""
    return jnp.pad(x, ((0, 0), (p, p), (0, 0)), mode="reflect")


def conv1d(x, kernel, bias, *, dilation: int = 1, precision=None):
    """(B,L,I) x (K,I,O) -> (B,L',O), VALID padding."""
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision,
    )
    return y + bias


def conv_transpose1d_torch(x, w_torch, bias, *, stride: int, padding: int,
                           output_padding: int = 0, precision=None):
    """torch ``ConvTranspose1d`` semantics in NLC layout.

    w_torch: (I, O, K) exactly as torch stores it.
    out_len = (L-1)*stride - 2*padding + K + output_padding.
    Implemented as an input-dilated convolution with the kernel flipped
    in K and transposed (I<->O) — the standard transpose-conv identity.
    """
    k = w_torch.shape[-1]
    kernel = jnp.flip(w_torch, axis=-1).transpose(2, 0, 1)  # (K, I, O)
    pad = (k - 1 - padding, k - 1 - padding + output_padding)
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1,),
        padding=[pad],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision,
    )
    return y + bias


class MelGANGenerator(nn.Module):
    """Functional MelGAN generator; params follow the torch module tree."""

    n_mels: int = 80
    ngf: int = 32
    n_residual_layers: int = 3
    precision: Optional[str] = None

    @nn.compact
    def __call__(self, mel):
        """mel: (B, n_mels, T) log10-mel -> (B, T*256) waveform in [-1,1]."""
        prec = self.precision
        x = jnp.swapaxes(mel, 1, 2)  # (B, T, M)

        mult = int(2 ** len(RATIOS))

        def conv_param(name, k, i, o):
            kern = self.param(f"{name}_kernel", nn.initializers.normal(0.02), (k, i, o))
            bias = self.param(f"{name}_bias", nn.initializers.zeros, (o,))
            return kern, bias

        kern, bias = conv_param("conv_in", 7, self.n_mels, mult * self.ngf)
        x = conv1d(reflect_pad_t(x, 3), kern, bias, precision=prec)

        for i, r in enumerate(RATIOS):
            out_ch = mult * self.ngf // 2
            x = leaky_relu(x)
            wt = self.param(
                f"up{i}_kernel", nn.initializers.normal(0.02),
                (mult * self.ngf, out_ch, 2 * r),  # torch (I, O, K)
            )
            bt = self.param(f"up{i}_bias", nn.initializers.zeros, (out_ch,))
            x = conv_transpose1d_torch(
                x, wt, bt, stride=r, padding=r // 2 + r % 2,
                output_padding=r % 2, precision=prec,
            )
            for j in range(self.n_residual_layers):
                d = 3 ** j
                k1, b1 = conv_param(f"res{i}_{j}_conv1", 3, out_ch, out_ch)
                k2, b2 = conv_param(f"res{i}_{j}_conv2", 1, out_ch, out_ch)
                ks, bs = conv_param(f"res{i}_{j}_shortcut", 1, out_ch, out_ch)
                h = leaky_relu(x)
                h = conv1d(reflect_pad_t(h, d), k1, b1, dilation=d, precision=prec)
                h = leaky_relu(h)
                h = conv1d(h, k2, b2, precision=prec)
                s = conv1d(x, ks, bs, precision=prec)
                x = s + h
            mult //= 2

        x = leaky_relu(x)
        kern, bias = conv_param("conv_out", 7, self.ngf, 1)
        x = conv1d(reflect_pad_t(x, 3), kern, bias, precision=prec)
        return jnp.tanh(x)[..., 0]  # (B, T*256)


# ---------------------------------------------------------------------------
# torch weight-norm checkpoint conversion
# ---------------------------------------------------------------------------

def _fold_weight_norm(g, v):
    """weight_norm(dim=0): w[o] = g[o] * v[o] / ||v[o]|| (norm over dims>0)."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v * v).sum(axis=axes, keepdims=True))
    return (g / norm) * v


def melgan_params_from_torch(sd: Dict[str, Any], n_residual_layers: int = 3) -> Dict:
    """Map a melgan-neurips generator state_dict to our param tree.

    The torch module is one big ``nn.Sequential`` named ``model``; index
    layout at defaults (ratios 8,8,2,2, n_res=3):
        1: conv_in;  per-block i: base=2+i*(2+n_res) -> base+1 is the
        transpose conv, base+2.. the ResnetBlocks; -3..-1: conv_out/tanh.
    Accepts raw (weight_g, weight_v) pairs or already-folded weights.
    """

    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def get_w(prefix):
        if f"{prefix}.weight_v" in sd:
            return _fold_weight_norm(np_(sd[f"{prefix}.weight_g"]),
                                     np_(sd[f"{prefix}.weight_v"]))
        return np_(sd[f"{prefix}.weight"])

    def get_b(prefix):
        return np_(sd[f"{prefix}.bias"])

    p: Dict[str, Any] = {}

    def put_conv(name, prefix):
        w = get_w(prefix)  # torch Conv1d: (O, I, K)
        p[f"{name}_kernel"] = w.transpose(2, 1, 0).astype(np.float32)  # (K, I, O)
        p[f"{name}_bias"] = get_b(prefix).astype(np.float32)

    put_conv("conv_in", "model.1")
    idx = 2
    for i, r in enumerate(RATIOS):
        idx += 1  # LeakyReLU
        w = get_w(f"model.{idx}")  # ConvTranspose1d: (I, O, K), kept as-is
        p[f"up{i}_kernel"] = w.astype(np.float32)
        p[f"up{i}_bias"] = get_b(f"model.{idx}").astype(np.float32)
        idx += 1
        for j in range(n_residual_layers):
            base = f"model.{idx}"
            # ResnetBlock: block.2 (conv3), block.4 (conv1), shortcut
            wb = get_w(f"{base}.block.2")
            p[f"res{i}_{j}_conv1_kernel"] = wb.transpose(2, 1, 0).astype(np.float32)
            p[f"res{i}_{j}_conv1_bias"] = get_b(f"{base}.block.2").astype(np.float32)
            wb = get_w(f"{base}.block.4")
            p[f"res{i}_{j}_conv2_kernel"] = wb.transpose(2, 1, 0).astype(np.float32)
            p[f"res{i}_{j}_conv2_bias"] = get_b(f"{base}.block.4").astype(np.float32)
            ws = get_w(f"{base}.shortcut")
            p[f"res{i}_{j}_shortcut_kernel"] = ws.transpose(2, 1, 0).astype(np.float32)
            p[f"res{i}_{j}_shortcut_bias"] = get_b(f"{base}.shortcut").astype(np.float32)
            idx += 1
    # tail: LeakyReLU, ReflectionPad, conv_out, tanh
    idx += 2
    put_conv("conv_out", f"model.{idx}")
    return {"params": p}


def decode_mel(gen: MelGANGenerator, params, mel, mean, std):
    """Denormalize (reference utils.py:25-39: mel*std+mean) then vocode."""
    mel = mel * std + mean
    return gen.apply(params, mel)
