"""Fused InstanceNorm(+gate) Pallas kernels.

The generator/discriminator interleave convs with InstanceNorm and two
gate flavors (SURVEY §2.2/§2.3): plain IN, swish(IN(x)), and the true
GLU pair IN(h) * sigmoid(IN(g)). XLA computes each IN as separate
reduce + normalize passes over HBM; these kernels keep a whole
per-sample slab in VMEM and do stats + normalize + gate in one pass:

    XLA:    read x (reduce) -> read x (normalize) -> write y   [per branch]
    fused:  read h, read g -> write y               (stats on-chip)

Layout: callers reshape NHWC (B, H, W, C) -> (B, S=H*W, C) (free,
row-major); stats reduce over S per (sample, channel) — exactly torch
InstanceNorm semantics (biased var, eps 1e-5, affine).

Forward-only kernels with a jax.custom_vjp whose backward recomputes
statistics from the saved inputs (standard norm backward, expressed in
XLA — the backward is reduction-light relative to conv grads, so fusing
it buys little; the forward is the hot inference/eval path).

Grid: one program per batch sample. VMEM: the largest slab in the model
is (10240, 128) f32 = 5.2 MB — fits with double buffering room.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5


def _chunk(S: int, C: int) -> int:
    """Largest divisor of S whose f32 chunk (CH, C) stays under ~2 MB.

    Keeps the kernels' scoped-VMEM footprint bounded by the bf16 slab
    plus one small f32 chunk, instead of a full-slab f32 temp (which
    OOMs scoped VMEM at the model's largest slab, (10240, 128)).
    """
    cap = max(1, (2 << 20) // (4 * C))
    if S <= cap:
        return S
    for ch in range(cap, 0, -1):
        if S % ch == 0:
            return ch
    return S


def _stats(x_ref):
    """Two-pass per-channel mean / rsqrt(var+eps) over a (1,S,C) block.

    f32 accumulation in (chunk, C) pieces; two-pass variance (torch
    InstanceNorm numerics, no E[x^2]-E[x]^2 cancellation).
    """
    S, C = x_ref.shape[1], x_ref.shape[2]
    ch = _chunk(S, C)
    n = S // ch
    tot = jnp.zeros((1, C), jnp.float32)
    for i in range(n):
        tot = tot + jnp.sum(x_ref[0, i * ch:(i + 1) * ch, :].astype(jnp.float32),
                            axis=0, keepdims=True)
    mean = tot / S
    sq = jnp.zeros((1, C), jnp.float32)
    for i in range(n):
        d = x_ref[0, i * ch:(i + 1) * ch, :].astype(jnp.float32) - mean
        sq = sq + jnp.sum(d * d, axis=0, keepdims=True)
    inv = jax.lax.rsqrt(sq / S + EPS)
    return mean, inv


def _in_kernel(x_ref, s_ref, b_ref, y_ref):
    mean, inv = _stats(x_ref)
    a = inv * s_ref[0].astype(jnp.float32)
    b = b_ref[0].astype(jnp.float32) - mean * a
    S, C = x_ref.shape[1], x_ref.shape[2]
    ch = _chunk(S, C)
    for i in range(S // ch):
        sl = slice(i * ch, (i + 1) * ch)
        y_ref[0, sl, :] = (x_ref[0, sl, :].astype(jnp.float32) * a
                           + b).astype(y_ref.dtype)


def _in_swish_kernel(x_ref, s_ref, b_ref, y_ref):
    mean, inv = _stats(x_ref)
    a = inv * s_ref[0].astype(jnp.float32)
    b = b_ref[0].astype(jnp.float32) - mean * a
    S, C = x_ref.shape[1], x_ref.shape[2]
    ch = _chunk(S, C)
    for i in range(S // ch):
        sl = slice(i * ch, (i + 1) * ch)
        z = x_ref[0, sl, :].astype(jnp.float32) * a + b
        y_ref[0, sl, :] = (z * jax.nn.sigmoid(z)).astype(y_ref.dtype)


def _in_glu_kernel(h_ref, g_ref, sh_ref, bh_ref, sg_ref, bg_ref, y_ref):
    mh, ih = _stats(h_ref)
    mg, ig = _stats(g_ref)
    ah = ih * sh_ref[0].astype(jnp.float32)
    ag = ig * sg_ref[0].astype(jnp.float32)
    bh = bh_ref[0].astype(jnp.float32) - mh * ah
    bg = bg_ref[0].astype(jnp.float32) - mg * ag
    S, C = h_ref.shape[1], h_ref.shape[2]
    ch = _chunk(S, C)
    for i in range(S // ch):
        sl = slice(i * ch, (i + 1) * ch)
        yh = h_ref[0, sl, :].astype(jnp.float32) * ah + bh
        yg = g_ref[0, sl, :].astype(jnp.float32) * ag + bg
        y_ref[0, sl, :] = (yh * jax.nn.sigmoid(yg)).astype(y_ref.dtype)


def _call_per_sample(kernel, out_dtype, tensors, vecs, interpret):
    """Launch `kernel` with grid over batch; tensors (B,S,C), vecs (C,)."""
    B, S, C = tensors[0].shape
    in_specs = [
        pl.BlockSpec((1, S, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        for _ in tensors
    ] + [
        pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM)
        for _ in vecs
    ]
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, S, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), out_dtype),
        interpret=interpret,
    )(*tensors, *[v.reshape(1, C) for v in vecs])


# ---------------------------------------------------------------------------
# custom_vjp wrappers (XLA backward, recompute stats from saved inputs)
# ---------------------------------------------------------------------------

def _xla_in(x, scale, bias):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + EPS)
    a = inv * scale.astype(jnp.float32)
    return xf * a + (bias.astype(jnp.float32) - mean * a)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def instance_norm_fused(x, scale, bias, interpret=False):
    """(B,S,C) fused affine IN (torch numerics)."""
    return _call_per_sample(_in_kernel, x.dtype, [x], [scale, bias], interpret)


def _in_fwd(x, scale, bias, interpret):
    return instance_norm_fused(x, scale, bias, interpret), (x, scale, bias)


def _in_bwd(interpret, res, dy):
    x, scale, bias = res
    dyf = dy.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + EPS)
    xhat = (xf - mean) * inv
    dscale = jnp.sum(dyf * xhat, axis=(0, 1))
    dbias = jnp.sum(dyf, axis=(0, 1))
    a = scale.astype(jnp.float32) * inv
    dx = a * (dyf - jnp.mean(dyf, axis=1, keepdims=True)
              - xhat * jnp.mean(dyf * xhat, axis=1, keepdims=True))
    return dx.astype(x.dtype), dscale.astype(scale.dtype), dbias.astype(bias.dtype)


instance_norm_fused.defvjp(_in_fwd, _in_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def instance_norm_swish_fused(x, scale, bias, interpret=False):
    """(B,S,C) fused swish(IN(x)) (discriminator/upsample epilogue)."""
    return _call_per_sample(_in_swish_kernel, x.dtype, [x], [scale, bias],
                            interpret)


def _insw_fwd(x, scale, bias, interpret):
    return instance_norm_swish_fused(x, scale, bias, interpret), (x, scale, bias)


def _insw_bwd(interpret, res, dy):
    x, scale, bias = res
    dyf = dy.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + EPS)
    xhat = (xf - mean) * inv
    z = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    s = jax.nn.sigmoid(z)
    dz = dyf * (s + z * s * (1.0 - s))
    dscale = jnp.sum(dz * xhat, axis=(0, 1))
    dbias = jnp.sum(dz, axis=(0, 1))
    a = scale.astype(jnp.float32) * inv
    dx = a * (dz - jnp.mean(dz, axis=1, keepdims=True)
              - xhat * jnp.mean(dz * xhat, axis=1, keepdims=True))
    return dx.astype(x.dtype), dscale.astype(scale.dtype), dbias.astype(bias.dtype)


instance_norm_swish_fused.defvjp(_insw_fwd, _insw_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def instance_norm_glu_fused(h, g, scale_h, bias_h, scale_g, bias_g,
                            interpret=False):
    """(B,S,C) fused IN(h) * sigmoid(IN(g)) (gated downsample/residual)."""
    return _call_per_sample(_in_glu_kernel, h.dtype, [h, g],
                            [scale_h, bias_h, scale_g, bias_g], interpret)


def _inglu_fwd(h, g, sh, bh, sg, bg, interpret):
    return (instance_norm_glu_fused(h, g, sh, bh, sg, bg, interpret),
            (h, g, sh, bh, sg, bg))


def _inglu_bwd(interpret, res, dy):
    h, g, sh, bh, sg, bg = res
    dyf = dy.astype(jnp.float32)

    def stats(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
        inv = jax.lax.rsqrt(var + EPS)
        return xf, (xf - mean) * inv, inv

    hf, hhat, ih = stats(h)
    gf, ghat, ig = stats(g)
    yh = hhat * sh.astype(jnp.float32) + bh.astype(jnp.float32)
    yg = ghat * sg.astype(jnp.float32) + bg.astype(jnp.float32)
    s = jax.nn.sigmoid(yg)

    dyh = dyf * s
    dyg = dyf * yh * s * (1.0 - s)

    def in_bwd(dz, xhat, inv, scale):
        dscale = jnp.sum(dz * xhat, axis=(0, 1))
        dbias = jnp.sum(dz, axis=(0, 1))
        a = scale.astype(jnp.float32) * inv
        dx = a * (dz - jnp.mean(dz, axis=1, keepdims=True)
                  - xhat * jnp.mean(dz * xhat, axis=1, keepdims=True))
        return dx, dscale, dbias

    dh, dsh, dbh = in_bwd(dyh, hhat, ih, sh)
    dg, dsg, dbg = in_bwd(dyg, ghat, ig, sg)
    return (dh.astype(h.dtype), dg.astype(g.dtype),
            dsh.astype(sh.dtype), dbh.astype(bh.dtype),
            dsg.astype(sg.dtype), dbg.astype(bg.dtype))


instance_norm_glu_fused.defvjp(_inglu_fwd, _inglu_bwd)
