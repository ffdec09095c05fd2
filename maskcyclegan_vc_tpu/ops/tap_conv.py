"""Tiny-channel 2D convolutions as MXU-shaped tap matmuls.

The model has four stride-1 convs whose channel counts starve the MXU
(reference ``mask_cyclegan_vc/model.py``):

  * Generator ``conv1``/``conv1_gates``  — Cin=2,  k(5,15) (model.py:116-126)
  * Generator ``lastConvLayer``          — Cout=1, k(5,15) (model.py:207-211)
  * Discriminator ``convLayer1``         — Cin=1,  k(3,3)  (model.py:290-295)
  * Discriminator ``outputConvLayer``    — Cout=1, k(1,3)  (model.py:323-327)

Lowered as ``lax.conv`` these pad the 1-2 wide channel dim to full MXU
lanes (measured ~2.5 ms each on v5e at batch 32x128 — ~1% MXU
utilization), and their grads are equally starved (dX of a Cout=1 conv
is a Cin=1 conv, dW has a 1-wide output).

Reformulation (torch-exact numerics up to f32 summation order):

  * tiny Cin  ("patches"): stack the kh*kw shifted input slices on the
    channel axis (pure data movement, one loop fusion) and contract all
    of (tap, cin) against the kernel in ONE fat matmul with N=Cout.
  * tiny Cout ("tap-sum"): contract channels pointwise against the
    kernel reshaped (Cin, kh*kw*Cout) — a fat matmul with K=Cin — then
    sum the kh*kw shifted slices of the result (one elementwise fusion,
    f32 accumulation).

Both forms are plain jnp, so autodiff yields the transposed forms, which
are themselves fat matmuls + shifted-slice scatters: forward, dX and dW
all run on the MXU at full lane width. No custom VJP needed.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def use_tap_conv(in_ch: int, out_ch: int, strides: Tuple[int, int]) -> bool:
    """Auto-rule: tap formulation only helps MXU-starved stride-1 convs."""
    import os

    # A/B escape hatch for benchmarks; same off-values convention as
    # MASKVC_REQUIRE_MULTIHOST (parallel/dist.py): '0'/''/'false' = unset.
    if os.environ.get("MASKVC_NO_TAP", "0") not in ("0", "", "false"):
        return False
    return strides == (1, 1) and (in_ch <= 4 or out_ch <= 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _tap_sum(u, k, out_hw):
    """y[o,b,h,w] = sum_{i,j} u[(i*kw+j)*cout+o, b, h+i, w+j].

    Custom VJP: jax's native cotangent for a sum-of-slices is an
    ``add_any`` over kh*kw FULL-SIZE zero-padded tensors (4.3 GB of adds
    for the generator's lastConvLayer at batch 32x128 — measured ~2.3 ms
    per scatter on v5e); here the bwd assembles du as ONE concat of
    padded dy planes (a single write of u's size).
    """
    kh, kw, cout = k
    Ho, Wo = out_hw
    acc = None
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            s = u[t * cout:(t + 1) * cout, :,
                  i:i + Ho, j:j + Wo].astype(jnp.float32)
            acc = s if acc is None else acc + s
    return acc.astype(u.dtype)


def _tap_sum_fwd(u, k, out_hw):
    return _tap_sum(u, k, out_hw), None


def _tap_sum_bwd(k, out_hw, res, dy):
    # dy has y's aval, and y.dtype == u.dtype; u's spatial dims are the
    # padded Ho + kh - 1, Wo + kw - 1.
    del res
    kh, kw, cout = k
    Ho, Wo = out_hw
    planes = [
        jnp.pad(dy, ((0, 0), (0, 0), (i, kh - 1 - i), (j, kw - 1 - j)))
        for i in range(kh) for j in range(kw)
    ]
    return (jnp.concatenate(planes, axis=0),)


_tap_sum.defvjp(_tap_sum_fwd, _tap_sum_bwd)


def _dot(a, b, precision):
    return lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())), precision=precision
    )


def tap_conv2d(x, kernel, bias, padding: Tuple[int, int],
               precision=None):
    """Torch-semantics stride-1 conv2d for tiny Cin or tiny Cout.

    Args:
      x: (B, H, W, Cin) NHWC input.
      kernel: (kh, kw, Cin, Cout) HWIO weights.
      bias: (Cout,) or None.
      padding: symmetric (ph, pw), torch ``nn.Conv2d(padding=...)``.

    Returns:
      (B, Ho, Wo, Cout) with Ho = H + 2ph - kh + 1 (stride 1).
    """
    kh, kw, cin, cout = kernel.shape
    ph, pw = padding
    B, H, W, _ = x.shape
    Ho, Wo = H + 2 * ph - kh + 1, W + 2 * pw - kw + 1
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))

    if cin <= cout:
        # Patches: P[..., (i*kw+j)*cin + c] = xp[b, h+i, w+j, c].
        cols = [
            xp[:, i:i + Ho, j:j + Wo, :]
            for i in range(kh) for j in range(kw)
        ]
        patches = jnp.concatenate(cols, axis=-1)  # (B,Ho,Wo,kh*kw*cin)
        wmat = kernel.reshape(kh * kw * cin, cout)
        y = _dot(patches, wmat, precision)
    else:
        # Tap-sum with taps on the LEADING dim: u[t*cout+o, b, h, w] =
        # sum_c K[i,j,c,o] xp[b,h,w,c], computed by putting the kernel on
        # the matmul LHS so no transpose materializes. Tap slices (and
        # their VJP scatter) are then contiguous planes — putting taps on
        # the channel/lane axis instead makes every slice read a full
        # 128-lane tile for 1 lane (measured ~3 ms per scatter on v5e).
        wmat = kernel.transpose(0, 1, 3, 2).reshape(kh * kw * cout, cin)
        u = lax.dot_general(
            wmat, xp, (((1,), (3,)), ((), ())), precision=precision
        )  # (kh*kw*cout, B, H+2ph, W+2pw)
        y = _tap_sum(u, (kh, kw, cout), (Ho, Wo))
        y = y.transpose(1, 2, 3, 0)  # (cout, B, Ho, Wo) -> (B, Ho, Wo, cout)

    if bias is not None:
        y = y + bias
    return y
