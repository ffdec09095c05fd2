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
    (A phase-conv lowering — one k=2 conv emitting r*O channels + an
    interleaving reshape, no dilation zeros — measured SLOWER at every
    ratio on v5e: +7 ms f32 / +1.5 ms bf16-fused per decode at batch
    32x128; the interleave/slice relayouts outweigh the dilation-zero
    MXU rows. Round-4 negative result; implementation in git history.)
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
    """Functional MelGAN generator; params follow the torch module tree.

    ``dtype=jnp.bfloat16`` runs the conv stack in bf16 (the vocoder is
    HBM-bandwidth-bound on TPU — the late stages stream (B, 32768, 32)
    activations through ~12 convs — so halving the bytes buys ~20%;
    measured max waveform deviation vs f32 < 1e-4 on [-1,1] output).
    Keep the f32 default for quality-critical offline conversion; the
    in-loop eval decode (bench config 5, TB audio) uses bf16.
    """

    n_mels: int = 80
    ngf: int = 32
    n_residual_layers: int = 3
    precision: Optional[str] = None
    dtype: Optional[Any] = None
    # Fuse each stage's 3 ResnetBlocks into one Pallas program (x read
    # once, blocks chained in VMEM — ops/pallas/melgan_stack_kernel.py;
    # 19 -> 12.5 ms f32 / 15 -> 7.4 ms bf16 per decode at batch 32x128,
    # and at f32 MORE accurate than the XLA path, whose default-precision
    # convs run bf16 MXU passes while the kernel runs full precision).
    # None = auto (on when the backend is TPU); True forces it (tests use
    # interpret mode on CPU); False keeps the per-block XLA chain. Only
    # kicks in for the standard 3-block dilation-(1,3,9) layout when the
    # whole-sample buffers fit VMEM.
    fused_stages: Optional[bool] = None

    def _use_fused_stage(self, x) -> bool:
        fused = self.fused_stages
        if fused is None:
            fused = jax.default_backend() == "tpu"
        if not fused or self.n_residual_layers != 3:
            return False
        from maskcyclegan_vc_tpu.ops.pallas import melgan_stack_kernel as mk

        _, W, C = x.shape
        if W % mk._pack_factor(C) != 0:
            return False
        return mk.melgan_resstack_vmem_bytes(
            W, C, jnp.dtype(x.dtype).itemsize) <= mk._VMEM_BUDGET

    @nn.compact
    def __call__(self, mel):
        """mel: (B, n_mels, T) log10-mel -> (B, T*256) waveform in [-1,1]."""
        prec = self.precision
        x = jnp.swapaxes(mel, 1, 2)  # (B, T, M)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        mult = int(2 ** len(RATIOS))

        def conv_param(name, k, i, o):
            kern = self.param(f"{name}_kernel", nn.initializers.normal(0.02), (k, i, o))
            bias = self.param(f"{name}_bias", nn.initializers.zeros, (o,))
            if self.dtype is not None:
                kern, bias = kern.astype(self.dtype), bias.astype(self.dtype)
            return kern, bias

        kern, bias = conv_param("conv_in", 7, self.n_mels, mult * self.ngf)
        x = conv1d(reflect_pad_t(x, 3), kern, bias, precision=prec)

        pre_activated = False
        for i, r in enumerate(RATIOS):
            out_ch = mult * self.ngf // 2
            if not pre_activated:
                x = leaky_relu(x)
            wt = self.param(
                f"up{i}_kernel", nn.initializers.normal(0.02),
                (mult * self.ngf, out_ch, 2 * r),  # torch (I, O, K)
            )
            bt = self.param(f"up{i}_bias", nn.initializers.zeros, (out_ch,))
            if self.dtype is not None:
                wt, bt = wt.astype(self.dtype), bt.astype(self.dtype)
            x = conv_transpose1d_torch(
                x, wt, bt, stride=r, padding=r // 2 + r % 2,
                output_padding=r % 2, precision=prec,
            )
            blocks = []
            for j in range(self.n_residual_layers):
                d = 3 ** j
                k1, b1 = conv_param(f"res{i}_{j}_conv1", 3, out_ch, out_ch)
                k2, b2 = conv_param(f"res{i}_{j}_conv2", 1, out_ch, out_ch)
                ks, bs = conv_param(f"res{i}_{j}_shortcut", 1, out_ch, out_ch)
                blocks.append(dict(conv1_kernel=k1, conv1_bias=b1,
                                   conv2_kernel=k2, conv2_bias=b2,
                                   shortcut_kernel=ks, shortcut_bias=bs))
            last = i == len(RATIOS) - 1
            if self._use_fused_stage(x):
                from maskcyclegan_vc_tpu.ops.layers import _fused_interpret
                from maskcyclegan_vc_tpu.ops.pallas.melgan_stack_kernel import (
                    melgan_resstack,
                )

                if last:
                    # The generator tail (lrelu -> pad -> conv7 -> tanh)
                    # fuses into the final stage kernel; returns (B, W).
                    kern, bias = conv_param("conv_out", 7, self.ngf, 1)
                    return melgan_resstack(x, blocks, _fused_interpret(),
                                           tail_params=(kern, bias))
                # The stage output only feeds lrelu -> next up conv, so
                # the kernel emits it pre-activated.
                x = melgan_resstack(x, blocks, _fused_interpret(),
                                    emit_lrelu=True)
                pre_activated = True
            else:
                for j, bp in enumerate(blocks):
                    d = 3 ** j
                    h = leaky_relu(x)
                    h = conv1d(reflect_pad_t(h, d), bp["conv1_kernel"],
                               bp["conv1_bias"], dilation=d, precision=prec)
                    h = leaky_relu(h)
                    h = conv1d(h, bp["conv2_kernel"], bp["conv2_bias"],
                               precision=prec)
                    s = conv1d(x, bp["shortcut_kernel"], bp["shortcut_bias"],
                               precision=prec)
                    x = s + h
                pre_activated = False
            mult //= 2

        x = leaky_relu(x)  # the loop's last iteration never pre-activates
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
