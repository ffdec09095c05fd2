"""Fused MelGAN residual-stage kernel (eval-only, no VJP).

One MelGAN upsampling stage runs three ResnetBlocks (dilations 1, 3, 9;
reference: melgan-neurips generator, mirrored in models/melgan.py):

    for d in (1, 3, 9):
        h = conv1d_k3_dil_d(reflect_pad(leaky_relu(x), d))
        x = conv1d_k1(leaky_relu(h)) + conv1d_k1_shortcut(x)

As XLA convs this streams the full (B, W, C) activation through ~12
HBM round-trips per stage — and every late stage moves the same bytes
(W*C is constant across stages: 8192x128, 16384x64, 32768x32), so the
vocoder is bandwidth-bound at ~36% of HBM peak (round-4 profile:
18-19 ms/decode at batch 32x128, 99.9% conv time at 1-36 TF/s).

Design:
  * One Pallas program processes one batch element's ENTIRE stage in
    VMEM: x is read once, the three blocks chain through resident
    ping-pong buffers, the result is written once.
  * **Channel packing**: narrow stages (C < 128) store p = 128//C
    consecutive SAMPLES per buffer row (lanes [j*C + c] = sample
    q*p + j). This fills the 128-lane registers that a (W, 32) layout
    would waste 4x over, and turns every matmul into a full-K=128
    contraction. The dilated conv becomes a sum over packed row
    offsets s of (rows, pC) @ KP_s (pC, pC), where KP_s scatters
    K_t[ci, co] to lane-group blocks by the tap arithmetic
    (jo + o) divmod p — only offsets with nonzero weights are
    materialized (e.g. 5 for d=9 at p=4). FLOPs inflate by up to
    ~n_off*p/3 but run at full MXU width instead of C/128 of it.
  * The reflect padding lives in margin rows/lane-groups, refilled
    from the just-computed full-range output before each block —
    exactly the reference's pad-whole-sequence-then-conv semantics.
  * Each block's two k1 convs (out-proj + shortcut) merge into ONE
    matmul ((rows, 2pC) @ (2pC, pC), block-diagonal over lane groups).

Numerics: matmuls accumulate in f32 (preferred_element_type); buffers
hold x.dtype. The kernel is inference-only (decode is never trained
through); grads would fail loudly at trace time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DILATIONS = (1, 3, 9)
LRELU_SLOPE = 0.2

# The packed whole-sample buffers + pipelined in/out blocks need the
# scoped-vmem limit raised past the 16 MB default (v5e has headroom);
# this budget gates which shapes attempt the fused path at all. The
# estimate (melgan_resstack_vmem_bytes) accounts for EVERY resident
# buffer — chain scratch, f32 pack/unpack staging, double-buffered
# in/out pipeline blocks, weight blocks — and a test pins it against
# the buffers the pallas_call actually declares, so the budget can sit
# close to the compiler limit without admitting a shape that fails at
# Mosaic compile time.
_VMEM_LIMIT = 100 * 1024 * 1024
_VMEM_BUDGET = _VMEM_LIMIT


def _lrelu(x):
    xf = x.astype(jnp.float32)
    return jnp.where(xf >= 0, xf, LRELU_SLOPE * xf)


def _pack_factor(C: int) -> int:
    return max(1, 128 // C)


def _offsets(d: int, p: int):
    """Distinct packed-row offsets s touched by taps o in (-d, 0, d)."""
    offs = sorted({(jo + o) // p for jo in range(p) for o in (-d, 0, d)})
    return offs


def _margin(p: int) -> int:
    return max(max(abs(s) for s in _offsets(d, p)) for d in DILATIONS)


def _chunk_rows(Wp: int) -> int:
    n_chunks = min(8, max(1, Wp // 512))
    return -(-Wp // n_chunks)  # ceil


def _build_packed_k3_for_dilation(K, d: int, p: int):
    """(3, C, C) tap kernel -> list of (s, KP_s) with KP_s (p*C, p*C).

    KP_s[gi*C+ci, jo*C+co] = sum over taps t with (jo + o_t) // p == s
    and (jo + o_t) % p == gi of K[t, ci, co].
    """
    C = K.shape[1]
    out = {}
    for t, o in enumerate((-d, 0, d)):
        for jo in range(p):
            s, gi = divmod(jo + o, p)
            kp = out.setdefault(s, jnp.zeros((p * C, p * C), K.dtype))
            out[s] = kp.at[gi * C:(gi + 1) * C, jo * C:(jo + 1) * C].add(K[t])
    return [(s, out[s]) for s in sorted(out)]


def _build_packed_k1(Ks, K2, p: int):
    """Block-diagonal merged k1 weights: (2*p*C, p*C); rows are
    [x lane-groups | h lane-groups]."""
    C = Ks.shape[0]
    km = jnp.zeros((2 * p * C, p * C), Ks.dtype)
    for g in range(p):
        km = km.at[g * C:(g + 1) * C, g * C:(g + 1) * C].set(Ks)
        km = km.at[(p + g) * C:(p + g + 1) * C, g * C:(g + 1) * C].set(K2)
    return km


def _row_lane(sample: int, p: int, C: int, M: int):
    """Packed (row, lane_start) of a sample index (may be negative)."""
    q, j = divmod(sample, p)  # python floor-div handles negatives
    return M + q, j * C


def _reflect_fill(cur, d, p, C, W, M):
    """Samples -m and W-1+m copied per lane-group from their mirror
    samples (reference pads the whole sequence)."""
    for m in range(1, d + 1):
        r_dst, l_dst = _row_lane(-m, p, C, M)
        r_src, l_src = _row_lane(m, p, C, M)
        cur[r_dst:r_dst + 1, l_dst:l_dst + C] = (
            cur[r_src:r_src + 1, l_src:l_src + C])
        r_dst, l_dst = _row_lane(W - 1 + m, p, C, M)
        r_src, l_src = _row_lane(W - 1 - m, p, C, M)
        cur[r_dst:r_dst + 1, l_dst:l_dst + C] = (
            cur[r_src:r_src + 1, l_src:l_src + C])


def _stage_kernel(x_ref, k3_ref, b1_ref, km_ref, bm_ref, *rest, p, C, W,
                  offsets, sizes, emit_lrelu, tail, prec):
    if tail:
        k7_ref, b7_ref, o_ref, a_ref, b_ref, l_ref, q_ref, u_ref = rest
    else:
        o_ref, a_ref, b_ref, l_ref, q_ref, u_ref = rest
    M = _margin(p)
    Wp = W // p
    PC = p * C
    cw_base = q_ref.shape[0]

    # Zero the margin rows once: the packed-conv matmuls multiply the
    # unused lane groups of margin rows by zero weight blocks, which is
    # only safe if those lanes hold finite values.
    for ref in (a_ref, b_ref, l_ref):
        ref[:M] = jnp.zeros((M, PC), ref.dtype)
        ref[M + Wp:] = jnp.zeros((M, PC), ref.dtype)
    # In-VMEM pack: (W, C) rows -> (W/p, p*C) lanes. Mosaic rejects both
    # the row-major shape cast and non-32-bit strided loads, so stage
    # through an f32 scratch: contiguous cast copy, then 32-bit strided
    # sublane reads lane-group-by-lane-group.
    if p == 1:
        a_ref[M:M + Wp] = x_ref[0]
    else:
        u_ref[...] = x_ref[0].astype(jnp.float32)
        for g in range(p):
            a_ref[M:M + Wp, g * C:(g + 1) * C] = u_ref[g::p, :].astype(
                a_ref.dtype)
    cur, nxt = a_ref, b_ref
    k3_base = 0
    for j, d in enumerate(DILATIONS):
        _reflect_fill(cur, d, p, C, W, M)

        # leaky_relu ONCE per row (each row feeds several offsets).
        mo = max(abs(offsets[j][0]), abs(offsets[j][-1]))
        l_ref[M - mo:M + Wp + mo] = _lrelu(cur[M - mo:M + Wp + mo]).astype(
            l_ref.dtype)

        c0 = 0
        while c0 < Wp:
            cw = min(cw_base, Wp - c0)
            base = M + c0
            h = b1_ref[j].astype(jnp.float32)
            for i, s in enumerate(offsets[j]):
                h = h + jax.lax.dot_general(
                    l_ref[base + s:base + s + cw],
                    k3_ref[k3_base + i],
                    (((1,), (0,)), ((), ())),
                    precision=prec,
                    preferred_element_type=jnp.float32)
            q_ref[:cw, :PC] = cur[base:base + cw]
            q_ref[:cw, PC:] = _lrelu(h).astype(q_ref.dtype)
            out = jax.lax.dot_general(
                q_ref[:cw], km_ref[j],
                (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32) + bm_ref[j]
            nxt[base:base + cw] = out.astype(nxt.dtype)
            c0 += cw
        k3_base += sizes[j]
        cur, nxt = nxt, cur

    if tail:
        # Fused generator tail: lrelu -> reflect_pad(3) -> conv7 C->1
        # -> tanh, in the packed domain (output lanes = p samples).
        _reflect_fill(cur, 3, p, C, W, M)
        mo = max(1, -(-3 // p))
        l_ref[M - mo:M + Wp + mo] = _lrelu(cur[M - mo:M + Wp + mo]).astype(
            l_ref.dtype)
        n7 = k7_ref.shape[0]
        s0 = -((n7 - 1) // 2)
        c0 = 0
        while c0 < Wp:
            cw = min(cw_base, Wp - c0)
            base = M + c0
            w = b7_ref[0].astype(jnp.float32)
            for i in range(n7):
                w = w + jax.lax.dot_general(
                    l_ref[base + s0 + i:base + s0 + i + cw],
                    k7_ref[i],
                    (((1,), (0,)), ((), ())),
                    precision=prec,
                    preferred_element_type=jnp.float32)
            o_ref[0, c0:c0 + cw] = jnp.tanh(w).astype(o_ref.dtype)
            c0 += cw
    else:
        # Unpack (32-bit strided sublane stores into the f32 scratch,
        # then one contiguous cast copy out); when ``emit_lrelu``,
        # pre-activate — the stage output only feeds leaky_relu -> next
        # upsample conv, saving a full XLA pass.
        act = _lrelu if emit_lrelu else (lambda v: v.astype(jnp.float32))
        if p == 1:
            o_ref[0] = act(cur[M:M + Wp]).astype(o_ref.dtype)
        else:
            for g in range(p):
                u_ref[g::p, :] = act(cur[M:M + Wp, g * C:(g + 1) * C])
            o_ref[0] = u_ref[...].astype(o_ref.dtype)


def melgan_resstack_vmem_bytes(W: int, C: int, itemsize: int) -> int:
    """Upper bound on the kernel's resident VMEM for a (B, W, C) stage.

    Covers every buffer the pallas_call declares, for both the plain and
    the tail-fused variant (tests/test_melgan_stack.py::
    test_vmem_estimate_covers_declared_buffers pins this against the
    actual scratch_shapes/BlockSpecs): the 3 chain scratch buffers, the
    matmul chunk scratch, the always-allocated f32 pack/unpack staging
    (W*C*4 — 2x the per-buffer bf16 term), the double-buffered
    input/output pipeline blocks, and the weight blocks.
    """
    p = _pack_factor(C)
    Wp = max(1, W // p)
    rows = Wp + 2 * _margin(p)
    lanes = max(p * C, 128)  # VMEM pads lanes to 128
    scratch = (3 * rows + _chunk_rows(Wp) * 2) * lanes * itemsize
    scratch += W * max(C, 128) * 4  # f32 pack/unpack staging
    # Pipelined in/out blocks (x and the stage output), double-buffered.
    io = 2 * 2 * W * max(C, 128) * itemsize
    # Constant weight blocks: k3 (sum(sizes), PC, PC), b1 (3,1,PC),
    # km (3, 2PC, PC), bm (3,1,PC), plus the tail variant's k7/b7;
    # double-buffered too (Pallas revolves all blocks uniformly).
    n_taps = sum(len(_offsets(d, p)) for d in DILATIONS)
    n7 = 2 * (-(-3 // p)) + 1
    weights = (n_taps * lanes + 3 * 2 * lanes + 12 + n7 * 128) * lanes * itemsize
    return scratch + io + 2 * weights


def melgan_resstack(x, block_params, interpret: bool = False,
                    emit_lrelu: bool = False, tail_params=None):
    """Run a stage's three ResnetBlocks fused (see module docstring).

    Args:
      x: (B, W, C) stage activation (post-upsample-conv); W % (128//C)
        must be 0 for C < 128 (all MelGAN stage widths are).
      block_params: list of 3 dicts with keys conv1_kernel (3, C, C),
        conv1_bias (C,), conv2_kernel (1, C, C), conv2_bias (C,),
        shortcut_kernel (1, C, C), shortcut_bias (C,) — the same leaves
        models/melgan.py consumes, so the torch-imported tree is used
        verbatim.
      interpret: Pallas interpret mode (CPU tests).
      emit_lrelu: pre-activate the output (the stage result only feeds
        leaky_relu -> next upsample conv; saves a full XLA pass).
      tail_params: optional (kernel (7, C, 1), bias (1,)) — fuse the
        generator tail lrelu -> reflect_pad(3) -> conv7 -> tanh and
        return the (B, W) waveform instead of the stage activation.

    Returns:
      (B, W, C) stage output (optionally pre-activated), or (B, W)
      waveform when ``tail_params`` is given — numerically the XLA chain
      at f32-accumulation tolerance.
    """
    B, W, C = x.shape
    p = _pack_factor(C)
    Wp = W // p
    PC = p * C
    tail = tail_params is not None

    offsets = tuple(tuple(_offsets(d, p)) for d in DILATIONS)
    sizes = tuple(len(o) for o in offsets)

    k3_list = []
    for jb, (bp, d) in enumerate(zip(block_params, DILATIONS)):
        packed = _build_packed_k3_for_dilation(bp["conv1_kernel"], d, p)
        assert tuple(s for s, _ in packed) == offsets[jb]
        k3_list.extend(kp for _, kp in packed)
    k3 = jnp.stack(k3_list).astype(x.dtype)

    def rep(b):
        # bias for packed lanes: tile per lane group.
        return jnp.tile(b.reshape(1, C), (1, p)).astype(jnp.float32)

    b1 = jnp.stack([rep(bp["conv1_bias"]) for bp in block_params])
    km = jnp.stack([
        _build_packed_k1(bp["shortcut_kernel"][0], bp["conv2_kernel"][0], p)
        for bp in block_params]).astype(x.dtype)
    bm = jnp.stack([
        rep(bp["shortcut_bias"] + bp["conv2_bias"]) for bp in block_params])

    M = _margin(p)
    in_specs = [
        pl.BlockSpec((1, W, C), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((sum(sizes), PC, PC), lambda b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 1, PC), lambda b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 2 * PC, PC), lambda b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 1, PC), lambda b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, k3, b1, km, bm]
    if tail:
        k7t, b7t = tail_params
        n7 = 2 * (-(-3 // p)) + 1
        s0 = -((n7 - 1) // 2)
        kp7 = {s: jnp.zeros((PC, p), k7t.dtype) for s in range(s0, s0 + n7)}
        for t, o in enumerate(range(-3, 4)):
            for jo in range(p):
                s, gi = divmod(jo + o, p)
                kp7[s] = kp7[s].at[gi * C:(gi + 1) * C, jo].add(k7t[t, :, 0])
        k7 = jnp.stack([kp7[s] for s in range(s0, s0 + n7)]).astype(x.dtype)
        b7 = jnp.tile(b7t.reshape(1, 1), (1, p)).astype(jnp.float32)
        in_specs += [
            pl.BlockSpec((n7, PC, p), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ]
        args += [k7, b7]
        out_specs = pl.BlockSpec((1, Wp, p), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, Wp, p), x.dtype)
    else:
        out_specs = pl.BlockSpec((1, W, C), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, W, C), x.dtype)

    # f32 inputs: force full-precision MXU passes inside the kernel
    # (Mosaic's default for f32 dots is reduced-precision and measured
    # ~6e-4 off the XLA chain); bf16 inputs keep the fast default.
    prec = (jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    kern = functools.partial(_stage_kernel, p=p, C=C, W=W, offsets=offsets,
                             sizes=sizes, emit_lrelu=emit_lrelu, tail=tail,
                             prec=prec)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Wp + 2 * M, PC), x.dtype),
            pltpu.VMEM((Wp + 2 * M, PC), x.dtype),
            pltpu.VMEM((Wp + 2 * M, PC), x.dtype),
            pltpu.VMEM((_chunk_rows(Wp), 2 * PC), x.dtype),
            # f32 staging for the pack/unpack strided transfers (Mosaic
            # supports strided loads/stores only at 32-bit).
            pltpu.VMEM((W, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    return out.reshape(B, W) if tail else out
