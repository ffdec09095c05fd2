"""Fused MelGAN residual-stage kernel vs the XLA block chain (interpret)."""

import jax.numpy as jnp
import numpy as np

from maskcyclegan_vc_tpu.models.melgan import MelGANGenerator
from maskcyclegan_vc_tpu.ops.pallas.melgan_stack_kernel import melgan_resstack
from maskcyclegan_vc_tpu.utils.init import fast_init


def _ref_stage(x, blocks):
    import jax

    def lrelu(v):
        return jax.nn.leaky_relu(v, 0.2)

    from maskcyclegan_vc_tpu.models.melgan import conv1d, reflect_pad_t

    for j, bp in enumerate(blocks):
        d = 3 ** j
        h = lrelu(x)
        h = conv1d(reflect_pad_t(h, d), bp["conv1_kernel"], bp["conv1_bias"],
                   dilation=d)
        h = lrelu(h)
        h = conv1d(h, bp["conv2_kernel"], bp["conv2_bias"])
        s = conv1d(x, bp["shortcut_kernel"], bp["shortcut_bias"])
        x = s + h
    return x


def _blocks(rs, C):
    out = []
    for _ in range(3):
        out.append(dict(
            conv1_kernel=jnp.asarray(rs.randn(3, C, C) * 0.2, jnp.float32),
            conv1_bias=jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
            conv2_kernel=jnp.asarray(rs.randn(1, C, C) * 0.2, jnp.float32),
            conv2_bias=jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
            shortcut_kernel=jnp.asarray(rs.randn(1, C, C) * 0.2, jnp.float32),
            shortcut_bias=jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
        ))
    return out


def test_resstack_matches_xla_chain():
    rs = np.random.RandomState(0)
    for (B, W, C) in ((2, 64, 8), (1, 96, 16)):
        x = jnp.asarray(rs.randn(B, W, C), jnp.float32)
        blocks = _blocks(rs, C)
        got = np.asarray(melgan_resstack(x, blocks, interpret=True))
        want = np.asarray(_ref_stage(x, blocks))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_melgan_fused_stages_matches_unfused():
    """Whole-generator parity: fused_stages=True == baseline (same params)."""
    m0 = MelGANGenerator(n_mels=8, ngf=4)
    m1 = MelGANGenerator(n_mels=8, ngf=4, fused_stages=True)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 6), jnp.float32)
    p = fast_init(m0, 0, jnp.zeros((1, 8, 4)))
    y0 = np.asarray(m0.apply(p, x))
    y1 = np.asarray(m1.apply(p, x))
    np.testing.assert_allclose(y1, y0, atol=2e-5, rtol=2e-5)


def test_fused_stage_guards():
    """The fused path must decline shapes it can't handle (indivisible W
    for the pack factor, VMEM-overflowing buffers) and fall back to the
    XLA chain rather than failing at Mosaic compile time."""
    import jax.numpy as jnp

    from maskcyclegan_vc_tpu.ops.pallas import melgan_stack_kernel as mk

    m = MelGANGenerator(ngf=4, fused_stages=True)
    # C=8 -> p=16; W=24 not divisible by 16 -> must decline.
    assert not m._use_fused_stage(jnp.zeros((1, 24, 8), jnp.float32))
    # Divisible and small -> accepted.
    assert m._use_fused_stage(jnp.zeros((1, 64, 8), jnp.float32))
    # Oversized W*C -> VMEM budget declines.
    assert mk.melgan_resstack_vmem_bytes(1 << 22, 128, 4) > mk._VMEM_BUDGET
    assert not m._use_fused_stage(jnp.zeros((1, 1 << 22, 128), jnp.float32))
    # fused_stages=False always declines.
    m_off = MelGANGenerator(ngf=4, fused_stages=False)
    assert not m_off._use_fused_stage(jnp.zeros((1, 64, 8), jnp.float32))


def test_odd_length_melgan_falls_back_and_matches():
    """A mel length whose waveform W is not pack-divisible must still
    produce the same output as the XLA chain (via the fallback)."""
    m0 = MelGANGenerator(n_mels=8, ngf=4, fused_stages=False)
    m1 = MelGANGenerator(n_mels=8, ngf=4, fused_stages=True)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 5), jnp.float32)
    p = fast_init(m0, 0, jnp.zeros((1, 8, 4)))
    y0 = np.asarray(m0.apply(p, x))
    y1 = np.asarray(m1.apply(p, x))
    np.testing.assert_allclose(y1, y0, atol=2e-5, rtol=2e-5)


def test_resstack_low_pack_factors():
    """C=128 (p=1, the pack/unpack shortcut) and C=64 (p=2) branches in
    interpret mode — the production late-stage shapes, previously pinned
    only by the on-TPU parity check."""
    rs = np.random.RandomState(3)
    for (B, W, C) in ((1, 64, 128), (1, 64, 64), (2, 62, 64)):
        x = jnp.asarray(rs.randn(B, W, C) * 0.5, jnp.float32)
        blocks = _blocks(rs, C)
        got = np.asarray(melgan_resstack(x, blocks, interpret=True))
        want = np.asarray(_ref_stage(x, blocks))
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_resstack_tail_low_pack_factors():
    """Tail-fused variant (lrelu->reflect_pad->conv7->tanh) at p=1 and p=2."""
    import jax

    from maskcyclegan_vc_tpu.models.melgan import conv1d, reflect_pad_t

    rs = np.random.RandomState(4)
    for (B, W, C) in ((1, 64, 128), (1, 64, 64)):
        x = jnp.asarray(rs.randn(B, W, C) * 0.5, jnp.float32)
        blocks = _blocks(rs, C)
        k7 = jnp.asarray(rs.randn(7, C, 1) * 0.05, jnp.float32)
        b7 = jnp.asarray(rs.randn(1) * 0.1, jnp.float32)
        got = np.asarray(melgan_resstack(x, blocks, interpret=True,
                                         tail_params=(k7, b7)))
        h = jax.nn.leaky_relu(_ref_stage(x, blocks), 0.2)
        want = np.asarray(jnp.tanh(conv1d(reflect_pad_t(h, 3), k7, b7)))[..., 0]
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_vmem_estimate_covers_declared_buffers(monkeypatch):
    """melgan_resstack_vmem_bytes must bound what the pallas_call actually
    declares (scratch_shapes + double-buffered in/out/weight blocks), so
    the VMEM gate can't admit a shape that fails at Mosaic compile time."""
    import jax

    from maskcyclegan_vc_tpu.ops.pallas import melgan_stack_kernel as mk

    captured = {}
    real_call = mk.pl.pallas_call

    def spy(kernel, **kw):
        captured["scratch"] = kw.get("scratch_shapes", [])
        captured["in_specs"] = kw.get("in_specs", [])
        captured["out_specs"] = kw.get("out_specs")
        return real_call(kernel, **kw)

    monkeypatch.setattr(mk.pl, "pallas_call", spy)

    def padded_lanes(n):
        return -(-n // 128) * 128

    rs = np.random.RandomState(5)
    for (W, C), tail in (((64, 128), False), ((64, 64), False),
                         ((64, 32), False), ((64, 64), True)):
        x = jnp.asarray(rs.randn(1, W, C) * 0.5, jnp.float32)
        blocks = _blocks(rs, C)
        tp = None
        if tail:
            tp = (jnp.asarray(rs.randn(7, C, 1) * 0.05, jnp.float32),
                  jnp.zeros((1,), jnp.float32))
        mk.melgan_resstack(x, blocks, interpret=True, tail_params=tp)

        def block_bytes(spec):
            shp = [s for s in spec.block_shape if s is not None]
            rows = int(np.prod(shp[:-1])) if len(shp) > 1 else 1
            return rows * padded_lanes(shp[-1]) * x.dtype.itemsize

        declared = sum(
            int(np.prod([s for s in sc.shape[:-1]]))
            * padded_lanes(sc.shape[-1]) * jnp.dtype(sc.dtype).itemsize
            for sc in captured["scratch"])
        # in/out pipeline blocks are double-buffered across the grid.
        declared += 2 * sum(block_bytes(s) for s in captured["in_specs"])
        declared += 2 * block_bytes(captured["out_specs"])
        est = mk.melgan_resstack_vmem_bytes(W, C, x.dtype.itemsize)
        assert est >= declared, (W, C, tail, est, declared)
