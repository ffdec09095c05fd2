"""Pallas stride-1 'same' conv2d for the generator's upsample stages.

In the full train-step graph XLA runs upSample{1,2}_conv at 16-48% MFU:
layout assignment folds the neighboring reshape/transpose into the conv
as a strided-layout operand ({2,0,1,3} copies), and the conv emitter
underutilizes at these shapes ((B,20,32,256)->1024 and
(B,40,64,256)->512, k5 'same'). This kernel computes the conv as 25
shifted (HT*W, Ci) @ (Ci, Co) MXU matmuls accumulated in VMEM:

  * the padded input lives in HBM; each program DMAs one (HT+4, W+4, Ci)
    row-span into VMEM (grid = (B, H/HT)) — overlapping spans, so HBM
    traffic is ~(1 + 4/HT)x the input, read once per tap from VMEM;
  * the full (5,5,Ci,Co) weight block sits in VMEM;
  * the f32 accumulator never touches HBM; output written once.

pallas_call also forces default layouts on its operands, which is
itself worth milliseconds here (the XLA-chosen strided layouts are the
measured pathology).

Backward via jax.custom_vjp: dx is the SAME kernel with the
spatially-flipped, IO-transposed weights (stride-1 'same' conv
identity); dw reuses XLA's standard weight-grad formulation
(re-differentiated lax.conv — no layout pathology there... it
contracts over batch*space).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_ht(H: int) -> int:
    """Largest divisor of H that is <= 8 (accumulator stays ~<=1 MB)."""
    for ht in (8, 5, 4, 2, 1):
        if H % ht == 0:
            return ht
    return 1


def _make_kernel(ht: int, W: int, K: int):
    pad = K - 1

    def kernel(x_hbm, k_ref, o_ref, xs_ref, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(t * ht, ht + pad), :, :], xs_ref, sem)
        dma.start()
        dma.wait()
        Ci = xs_ref.shape[-1]
        Co = o_ref.shape[-1]
        acc = jnp.zeros((ht * W, Co), jnp.float32)
        for dh in range(K):
            for dw in range(K):
                xs = xs_ref[dh:dh + ht, dw:dw + W, :].reshape(ht * W, Ci)
                acc = acc + jnp.dot(xs, k_ref[dh, dw],
                                    preferred_element_type=jnp.float32)
        o_ref[0] = acc.reshape(ht, W, Co).astype(o_ref.dtype)

    return kernel


def _conv_same_raw(x, kernel, interpret: bool):
    """x (B,H,W,Ci), kernel (K,K,Ci,Co), K odd -> (B,H,W,Co), 'same'."""
    B, H, W, Ci = x.shape
    K, _, _, Co = kernel.shape
    p = (K - 1) // 2
    ht = _pick_ht(H)
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))

    return pl.pallas_call(
        _make_kernel(ht, W, K),
        grid=(B, H // ht),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # padded input stays in HBM
            pl.BlockSpec((K, K, Ci, Co), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, W, Co), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((ht + K - 1, W + K - 1, Ci), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, kernel)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_conv_same(x, kernel, interpret: bool = False):
    """Stride-1 'same' conv (odd K), Pallas forward + dx, XLA dw."""
    return _conv_same_raw(x, kernel, interpret)


def _pc_fwd(x, kernel, interpret):
    return _conv_same_raw(x, kernel, interpret), (x, kernel)


def _pc_bwd(interpret, res, dy):
    x, kernel = res
    # dx: same-padding correlation with the rot180, IO-transposed kernel.
    kT = jnp.flip(kernel, (0, 1)).transpose(0, 1, 3, 2)
    dx = _conv_same_raw(dy, kT.astype(dy.dtype), interpret)
    # dw: XLA's standard weight-grad path.
    p = (kernel.shape[0] - 1) // 2

    def fwd_k(k):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    (dw,) = jax.vjp(fwd_k, kernel)[1](dy.astype(x.dtype))
    return dx.astype(x.dtype), dw


pallas_conv_same.defvjp(_pc_fwd, _pc_bwd)
