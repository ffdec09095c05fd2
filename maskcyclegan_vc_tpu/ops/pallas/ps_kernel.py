"""Fused pixel-shuffle(2) + InstanceNorm + swish Pallas kernels.

The generator's two upsample stages are ``conv -> nn.PixelShuffle(2) ->
IN -> swish`` (reference model.py:226-237). As XLA HLO the shuffle is a
6D reshape+transpose that materializes layout copies in forward AND in
every transpose-of-jvp — measured ~46 ms of pure copies per train step
at batch 32x128 on v5e.

Design:
  * The conv's output channels are pre-permuted at the WEIGHT level
    (ops/layers.SubpixelConv2d) from torch PixelShuffle order
    ``c*4 + (2i+j)`` to shuffle-major ``(2i+j)*C + c``, so inside the
    kernel each sub-position q = 2i+j is a contiguous C-lane slice.
  * IN statistics for post-shuffle channel c pool the 4 sub-channels
    {q*C+c} over (H, W) — mathematically identical to computing IN
    after the shuffle, so they are computed BEFORE shuffling, on
    lane-friendly (S, 4C) slabs.
  * normalize + swish + shuffle happen chunked in VMEM; the shuffled
    tensor is written exactly once to HBM.

The backward is a jax.custom_vjp lowered to ONE fused Pallas kernel
(``_sis_bwd_kernel``): the forward's pooled stats arrive as residuals
(no stats re-reduction), pass A inverse-shuffles the cotangent chunk-
wise, computes dz, PARKS dz in the dx output block and accumulates the
q-pooled reductions, and pass B turns parked dz into dx with two FMAs
per element (in bf16 the parked dz costs one bf16 rounding — the same
quantum as the bf16 output). An XLA composition
(``_sis_bwd_xla``) remains only as the fallback when the whole-sample
blocks would exceed the VMEM budget (oversized --num_frames).

Forward output dtype follows x. Grid: one program per batch sample;
in/out blocks are auto-pipelined double-buffered by Pallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5


def _hchunk(H: int, W: int, C4: int, cap_bytes: int = 1 << 20) -> int:
    """Largest divisor of H with an f32 (hc, W, C4) chunk under the cap."""
    cap = max(1, cap_bytes // (4 * W * C4))
    if H <= cap:
        return H
    for hc in range(cap, 0, -1):
        if H % hc == 0:
            return hc
    return H


def _pooled_stats(x_ref, C: int):
    """Per-post-shuffle-channel mean / rsqrt(var+eps), pooled over q.

    x_ref block (1, H, W, 4C) q-major. Returns mean, inv of shape (1, C).
    One pass: E[x] and E[x^2] accumulate together (halves the VMEM
    re-reads + f32 converts vs the two-pass mean/centered-var form; the
    uncentered variance is computed in f32 on bf16 inputs whose values
    are O(1) post-conv, so cancellation stays benign vs eps=1e-5).
    """
    _, H, W, C4 = x_ref.shape
    hc = _hchunk(H, W, C4)
    n = H * W * 4
    tot = jnp.zeros((1, C4), jnp.float32)
    tot2 = jnp.zeros((1, C4), jnp.float32)
    for i in range(H // hc):
        xf = x_ref[0, i * hc:(i + 1) * hc, :, :].astype(jnp.float32)
        tot = tot + jnp.sum(xf, axis=(0, 1)).reshape(1, C4)
        tot2 = tot2 + jnp.sum(xf * xf, axis=(0, 1)).reshape(1, C4)
    mean = (tot[:, 0:C] + tot[:, C:2 * C] + tot[:, 2 * C:3 * C]
            + tot[:, 3 * C:4 * C]) / n
    ex2 = (tot2[:, 0:C] + tot2[:, C:2 * C] + tot2[:, 2 * C:3 * C]
           + tot2[:, 3 * C:4 * C]) / n
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    return mean, jax.lax.rsqrt(var + EPS)


def _shuffle_chunk(z, hc: int, W: int, C: int):
    """(hc, W, 4C) q-major -> (2hc, 2W, C), torch PixelShuffle(2) order.

    Row-major reshape (W, 2C) -> (2W, C) interleaves the two lane halves
    onto even/odd columns directly (the same identity the inverse kernel
    uses in reverse), so each output row pair needs one lane-split and
    one row interleave — no per-q stacking."""
    zA = z[:, :, :2 * C].reshape(hc, 2 * W, C)  # rows 2h   (q = 0, 1)
    zB = z[:, :, 2 * C:].reshape(hc, 2 * W, C)  # rows 2h+1 (q = 2, 3)
    return jnp.stack([zA, zB], axis=1).reshape(2 * hc, 2 * W, C)


def _ps_in_swish_kernel(x_ref, s_ref, b_ref, y_ref, mean_ref, inv_ref):
    _, H, W, C4 = x_ref.shape
    C = C4 // 4
    mean, inv = _pooled_stats(x_ref, C)
    # Stats are emitted as residuals so the backward kernel never has to
    # re-reduce x (kills a full pass over the sample there).
    mean_ref[0] = mean
    inv_ref[0] = inv
    a = inv * s_ref[0].astype(jnp.float32)
    b = b_ref[0].astype(jnp.float32) - mean * a
    a4 = jnp.concatenate([a] * 4, axis=-1)
    b4 = jnp.concatenate([b] * 4, axis=-1)
    hc = _hchunk(H, W, C4)
    for i in range(H // hc):
        z = x_ref[0, i * hc:(i + 1) * hc, :, :].astype(jnp.float32) * a4 + b4
        z = (z * jax.nn.sigmoid(z)).astype(y_ref.dtype)
        y_ref[0, 2 * i * hc:2 * (i + 1) * hc, :, :] = _shuffle_chunk(
            z, hc, W, C)


def _inv_shuffle_kernel(dy_ref, dz_ref):
    """(1, 2H, 2W, C) -> (1, H, W, 4C) q-major (transpose of the shuffle).

    De-interleaves with strided slices (Mosaic rejects the
    reshape-then-middle-dim-index form with an offset-mismatch error).
    """
    _, H, W, C4 = dz_ref.shape
    C = C4 // 4
    # Row-major reshape (2W, C) -> (W, 2C) packs each (2w, 2w+1) column
    # pair into lane halves [j=0 | j=1], so de-interleaving needs no
    # gather: dz[h, w] = [r_{2h}(W,2C) | r_{2h+1}(W,2C)] = q order
    # (i*2+j) exactly.
    for h in range(H):
        r0 = dy_ref[0, 2 * h, :, :].reshape(W, 2 * C)
        r1 = dy_ref[0, 2 * h + 1, :, :].reshape(W, 2 * C)
        dz_ref[0, h, :, :] = jnp.concatenate([r0, r1], axis=-1)


def pixel_shuffle_q_major(x, interpret=False):
    """Standalone Pallas shuffle: (B,H,W,4C) q-major -> (B,2H,2W,C)."""
    B, H, W, C4 = x.shape
    C = C4 // 4
    return pl.pallas_call(
        lambda x_ref, y_ref: _ps_shuffle_only(x_ref, y_ref),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, C4), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2 * H, 2 * W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * H, 2 * W, C), x.dtype),
        interpret=interpret,
    )(x)


def _ps_shuffle_only(x_ref, y_ref):
    _, H, W, C4 = x_ref.shape
    C = C4 // 4
    hc = _hchunk(H, W, C4)
    for i in range(H // hc):
        z = x_ref[0, i * hc:(i + 1) * hc, :, :]
        y_ref[0, 2 * i * hc:2 * (i + 1) * hc, :, :] = _shuffle_chunk(
            z, hc, W, C)


def inverse_pixel_shuffle_q_major(dy, interpret=False):
    """(B, 2H, 2W, C) -> (B, H, W, 4C) q-major."""
    B, H2, W2, C = dy.shape
    H, W = H2 // 2, W2 // 2
    return pl.pallas_call(
        _inv_shuffle_kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H2, W2, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W, 4 * C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 4 * C), dy.dtype),
        interpret=interpret,
    )(dy)


def _inv_chunk(dy, hc: int, W: int, C: int):
    """(2hc, 2W, C) shuffled rows -> (hc, W, 4C) q-major (inverse of
    ``_shuffle_chunk`` via the same lane-split reshape identity)."""
    d = dy.reshape(hc, 2, 2 * W, C)
    return jnp.concatenate(
        [d[:, 0].reshape(hc, W, 2 * C), d[:, 1].reshape(hc, W, 2 * C)],
        axis=-1)


def _sis_bwd_kernel(x_ref, dy_ref, s_ref, b_ref, mean_ref, inv_ref,
                    dx_ref, dsc_ref, dbi_ref):
    """Whole IN+swish+shuffle backward for one sample, fused, two passes.

    The forward's pooled stats arrive as residuals (mean/inv), so no
    stats re-reduction pass over x is needed. Pass A computes dz, PARKS
    dz in the dx output buffer, and accumulates the q-pooled reductions;
    pass B turns the parked dz into dx with only cheap arithmetic (no
    sigmoid recompute). In bf16 the parked dz is rounded to bf16 — the
    same quantum as the bf16 output itself. x and dy arrive as standard
    VMEM blocks (auto-pipelined double-buffered across grid programs —
    this also keeps the kernel vmappable, which in-kernel manual HBM DMA
    is not; the DMA-streamed variant measured no faster, the kernel is
    VPU-bound)."""
    _, H, W, C4 = x_ref.shape
    C = C4 // 4
    n = H * W * 4
    hc = _hchunk(H, W, C4, cap_bytes=1 << 18)
    nchunks = H // hc

    def pool(t):
        return (t[:, 0:C] + t[:, C:2 * C] + t[:, 2 * C:3 * C]
                + t[:, 3 * C:4 * C])

    def c4(t):
        return jnp.concatenate([t] * 4, axis=-1)

    mean = mean_ref[0]
    inv = inv_ref[0]
    scale = s_ref[0].astype(jnp.float32).reshape(1, C)
    bias = b_ref[0].astype(jnp.float32).reshape(1, C)
    # z = xhat*scale + bias folded to one FMA: z = x*zA + zB.
    zA4 = c4(inv * scale)
    zB4 = c4(bias - mean * inv * scale)

    # Pass A: dz + reductions. xhat never materializes:
    # sum(dz*xhat) = inv*(sum(dz*x) - mean*sum(dz)), so the loop only
    # accumulates sum(dz) and sum(dz*x).
    sdz = jnp.zeros((1, C4), jnp.float32)
    sdzxf = jnp.zeros((1, C4), jnp.float32)
    for i in range(nchunks):
        xf = x_ref[0, i * hc:(i + 1) * hc].astype(jnp.float32)
        z = xf * zA4 + zB4
        s = jax.nn.sigmoid(z)
        dyq = _inv_chunk(dy_ref[0, 2 * i * hc:2 * (i + 1) * hc], hc, W, C)
        dz = dyq.astype(jnp.float32) * (s + z * s * (1.0 - s))
        sdz = sdz + jnp.sum(dz, axis=(0, 1)).reshape(1, C4)
        sdzxf = sdzxf + jnp.sum(dz * xf, axis=(0, 1)).reshape(1, C4)
        dx_ref[0, i * hc:(i + 1) * hc] = dz.astype(dx_ref.dtype)
    pool_sdz = pool(sdz)
    dsc = inv * (pool(sdzxf) - mean * pool_sdz)
    dbi_ref[0] = pool_sdz
    dsc_ref[0] = dsc

    # Pass B constants: dx = a*(dz - mean_dz - xhat*mean_dzx) rewritten
    # as two FMAs dx = a4*t + cX4*x + c14 with per-channel constants.
    a = scale * inv
    mdz = pool_sdz / n
    mdzx = dsc / n
    a4 = c4(a)
    cX4 = c4(-a * mdzx * inv)
    c14 = c4(-a * mdz + a * mdzx * inv * mean)

    # Pass B: dx from the parked dz — two FMAs per element.
    for i in range(nchunks):
        xf = x_ref[0, i * hc:(i + 1) * hc].astype(jnp.float32)
        t = dx_ref[0, i * hc:(i + 1) * hc].astype(jnp.float32)
        dx = a4 * t + (cX4 * xf + c14)
        dx_ref[0, i * hc:(i + 1) * hc] = dx.astype(dx_ref.dtype)


def _sis_bwd_pallas(x, dy, scale, bias, mean, inv, interpret):
    B, H, W, C4 = x.shape
    C = C4 // 4
    dx, dsc, dbi = pl.pallas_call(
        _sis_bwd_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C4), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * H, 2 * W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, H, W, C4), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C4), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT),
        interpret=interpret,
    )(x, dy, scale.reshape(1, C), bias.reshape(1, C), mean, inv)
    return (dx, dsc.sum((0, 1)).astype(scale.dtype),
            dbi.sum((0, 1)).astype(bias.dtype))


# The fused backward brings x, dy and dx in as whole-sample VMEM blocks,
# each double-buffered by the Pallas grid pipeline (dy and dx hold the
# same element count as x, so the footprint is ~6x the per-sample x
# bytes). Past this budget (a large --num_frames at inference-scale T)
# fall back to the XLA composition instead of failing at Mosaic compile
# time far from the config knob (ADVICE r3). The pallas_call raises the
# scoped-vmem limit, so the budget — validated at the canonical
# 128-frame shapes (~15.7 MB at upSample2) — is the real gate.
_BWD_VMEM_BUDGET = 32 * (1 << 20)
_BWD_VMEM_LIMIT = 64 * 1024 * 1024


def _sis_bwd_vmem_bytes(x, dy):
    B, H, W, C4 = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    x_bytes = H * W * C4 * itemsize
    return 6 * x_bytes  # (x + dy + dx) blocks, double-buffered


def _sis_bwd_xla(x, dy, scale, bias, interpret):
    """XLA-composed backward (inverse-shuffle Pallas kernel + jnp math):
    the fallback when the fused kernel's scratches exceed VMEM."""
    B, H, W, C4 = x.shape
    C = C4 // 4
    dy_q = inverse_pixel_shuffle_q_major(dy, interpret)  # (B, H, W, 4C)
    xf = x.astype(jnp.float32).reshape(B, H * W * 4, C)
    n = H * W * 4
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=1, keepdims=True)
                      - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + EPS)
    xhat = (xf - mean) * inv
    sc = scale.astype(jnp.float32).reshape(1, 1, C)
    z = xhat * sc + bias.astype(jnp.float32).reshape(1, 1, C)
    s = jax.nn.sigmoid(z)
    dz = dy_q.astype(jnp.float32).reshape(B, n, C) * (s + z * s * (1.0 - s))
    sdz = jnp.sum(dz, axis=1, keepdims=True)
    sdzx = jnp.sum(dz * xhat, axis=1, keepdims=True)
    dx = (sc * inv) * (dz - sdz / n - xhat * sdzx / n)
    return (dx.reshape(B, H, W, C4).astype(x.dtype),
            sdzx.sum(axis=(0, 1)).astype(scale.dtype),
            sdz.sum(axis=(0, 1)).astype(bias.dtype))


def _sis_fwd_impl(x, scale, bias, interpret):
    """Forward pallas_call; returns (y, mean, inv) — the stats double as
    backward residuals."""
    B, H, W, C4 = x.shape
    C = C4 // 4
    return pl.pallas_call(
        _ps_in_swish_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C4), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 2 * H, 2 * W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 2 * H, 2 * W, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ),
        interpret=interpret,
    )(x, scale.reshape(1, C), bias.reshape(1, C))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def subpixel_in_swish(x, scale, bias, interpret=False):
    """swish(IN(pixel_shuffle(x))) with x (B,H,W,4C) q-major -> (B,2H,2W,C).

    IN uses torch InstanceNorm2d numerics on the POST-shuffle tensor
    (per-(sample, channel) biased stats, eps 1e-5, affine) — computed
    pre-shuffle by pooling each channel's 4 sub-positions.
    """
    return _sis_fwd_impl(x, scale, bias, interpret)[0]


def _sis_fwd(x, scale, bias, interpret):
    y, mean, inv = _sis_fwd_impl(x, scale, bias, interpret)
    return y, (x, scale, bias, mean, inv)


def _sis_bwd(interpret, res, dy):
    x, scale, bias, mean, inv = res
    if _sis_bwd_vmem_bytes(x, dy) > _BWD_VMEM_BUDGET:
        return _sis_bwd_xla(x, dy, scale, bias, interpret)
    # Fully-fused Pallas backward (inverse shuffle + IN/swish grads in
    # one kernel — see _sis_bwd_kernel).
    return _sis_bwd_pallas(x, dy, scale, bias, mean, inv, interpret)


subpixel_in_swish.defvjp(_sis_fwd, _sis_bwd)
