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
