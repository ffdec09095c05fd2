"""subpixel_in_swish / inverse shuffle kernels vs XLA reference (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np

from maskcyclegan_vc_tpu.ops.layers import pixel_shuffle_nhwc, swish
from maskcyclegan_vc_tpu.ops.pallas.ps_kernel import (
    inverse_pixel_shuffle_q_major,
    pixel_shuffle_q_major,
    subpixel_in_swish,
)


def q_major_to_torch(x):
    """(B,H,W,4C) q-major -> torch PixelShuffle channel order c*4+q."""
    B, H, W, C4 = x.shape
    C = C4 // 4
    return np.asarray(x).reshape(B, H, W, 4, C).transpose(
        0, 1, 2, 4, 3).reshape(B, H, W, C4)


def ref_in_swish(y):
    yf = np.asarray(y, np.float64)
    mean = yf.mean(axis=(1, 2), keepdims=True)
    var = yf.var(axis=(1, 2), keepdims=True)
    z = (yf - mean) / np.sqrt(var + 1e-5)
    return z / (1.0 + np.exp(-z)) * 1.0  # scale=1, bias=0 -> swish(z)


def test_shuffle_matches_torch_order():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 4, 6, 32), jnp.float32)  # C=8
    got = np.asarray(pixel_shuffle_q_major(x, interpret=True))
    want = np.asarray(pixel_shuffle_nhwc(jnp.asarray(q_major_to_torch(x)), 2))
    np.testing.assert_allclose(got, want, atol=0)


def test_inverse_is_transpose():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 4, 6, 32), jnp.float32)
    y = pixel_shuffle_q_major(x, interpret=True)
    back = inverse_pixel_shuffle_q_major(y, interpret=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


def test_fused_forward_matches_reference():
    rs = np.random.RandomState(2)
    C = 8
    x = jnp.asarray(rs.randn(2, 4, 6, 4 * C), jnp.float32)
    scale = jnp.asarray(rs.rand(C) + 0.5, jnp.float32)
    bias = jnp.asarray(rs.randn(C), jnp.float32)
    got = np.asarray(subpixel_in_swish(x, scale, bias, True))

    # reference: shuffle (torch order) -> IN -> swish
    y = np.asarray(pixel_shuffle_nhwc(jnp.asarray(q_major_to_torch(x)), 2),
                   np.float64)
    mean = y.mean(axis=(1, 2), keepdims=True)
    var = y.var(axis=(1, 2), keepdims=True)
    z = (y - mean) / np.sqrt(var + 1e-5)
    z = z * np.asarray(scale) + np.asarray(bias)
    want = z * (1.0 / (1.0 + np.exp(-z)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fused_grads_match_xla_path():
    rs = np.random.RandomState(3)
    C = 8
    x = jnp.asarray(rs.randn(2, 4, 6, 4 * C), jnp.float32)
    scale = jnp.asarray(rs.rand(C) + 0.5, jnp.float32)
    bias = jnp.asarray(rs.randn(C), jnp.float32)

    def loss_fused(x, s, b):
        return jnp.sum(jnp.sin(subpixel_in_swish(x, s, b, True)))

    def loss_ref(xt, s, b):
        # xt is the same input in torch channel order.
        y = pixel_shuffle_nhwc(xt, 2)
        mean = jnp.mean(y, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=(1, 2), keepdims=True)
        z = (y - mean) * jax.lax.rsqrt(var + 1e-5) * s + b
        return jnp.sum(jnp.sin(swish(z)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(q_major_to_torch(x)), scale, bias)
    # dx comes back in q-major layout; map the reference's torch-order dx.
    dx_ref_torch = np.asarray(gr[0])
    B, H, W, C4 = dx_ref_torch.shape
    dx_ref_q = dx_ref_torch.reshape(B, H, W, C, 4).transpose(
        0, 1, 2, 4, 3).reshape(B, H, W, C4)
    np.testing.assert_allclose(np.asarray(gf[0]), dx_ref_q, atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(gr[2]),
                               atol=1e-4, rtol=1e-4)


def test_bwd_xla_fallback_matches_pallas():
    """The VMEM-budget fallback (_sis_bwd_xla) must be grad-identical to
    the fused Pallas backward (ADVICE r3: oversized --num_frames must not
    hit a Mosaic compile error)."""
    from maskcyclegan_vc_tpu.ops.pallas import ps_kernel

    rs = np.random.RandomState(4)
    C = 8
    x = jnp.asarray(rs.randn(2, 4, 6, 4 * C), jnp.float32)
    scale = jnp.asarray(rs.rand(C) + 0.5, jnp.float32)
    bias = jnp.asarray(rs.randn(C), jnp.float32)
    dy = jnp.asarray(rs.randn(2, 8, 12, C), jnp.float32)

    got = ps_kernel._sis_bwd_xla(x, dy, scale, bias, True)
    _, mean, inv = ps_kernel._sis_fwd_impl(x, scale, bias, True)
    want = ps_kernel._sis_bwd_pallas(x, dy, scale, bias, mean, inv, True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-5, rtol=1e-5)


def test_bwd_budget_dispatch():
    """Oversized inputs route to the XLA backward instead of the fused
    kernel whose scratches would blow VMEM."""
    from maskcyclegan_vc_tpu.ops.pallas import ps_kernel

    small = jnp.zeros((1, 4, 6, 32), jnp.bfloat16)
    small_dy = jnp.zeros((1, 8, 12, 8), jnp.bfloat16)
    assert ps_kernel._sis_bwd_vmem_bytes(
        small, small_dy) <= ps_kernel._BWD_VMEM_BUDGET
    # up2-stage shapes at an extreme inference bucket (T=8192 frames).
    big = jnp.zeros((1, 40, 2048, 512), jnp.bfloat16)
    big_dy = jnp.zeros((1, 80, 4096, 128), jnp.bfloat16)
    assert ps_kernel._sis_bwd_vmem_bytes(
        big, big_dy) > ps_kernel._BWD_VMEM_BUDGET
