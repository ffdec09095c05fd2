"""tap_conv2d vs lax.conv_general_dilated: forward + grads, all 4 model shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskcyclegan_vc_tpu.ops.tap_conv import tap_conv2d, use_tap_conv


def ref_conv(x, kernel, bias, padding):
    ph, pw = padding
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=[(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision="highest",
    )
    return y + bias if bias is not None else y


# (name, in_shape, kernel hwio, padding) — the four MXU-starved convs
CASES = [
    ("G_conv1", (2, 16, 20, 2), (5, 15, 2, 128), (2, 7)),
    ("G_lastConv", (2, 16, 20, 128), (5, 15, 128, 1), (2, 7)),
    ("D_convLayer1", (2, 16, 20, 1), (3, 3, 1, 128), (1, 1)),
    ("D_outputConv", (2, 10, 8, 1024), (1, 3, 1024, 1), (0, 1)),
]


@pytest.mark.parametrize("name,xs,ks,pad", CASES)
def test_forward_matches_lax_conv(name, xs, ks, pad):
    rs = np.random.RandomState(hash(name) % 2**31)
    x = jnp.asarray(rs.randn(*xs), jnp.float32)
    k = jnp.asarray(rs.randn(*ks) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(ks[-1]), jnp.float32)
    got = tap_conv2d(x, k, b, pad, precision="highest")
    want = ref_conv(x, k, b, pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("name,xs,ks,pad", CASES)
def test_grads_match_lax_conv(name, xs, ks, pad):
    rs = np.random.RandomState(hash(name) % 2**31)
    x = jnp.asarray(rs.randn(*xs), jnp.float32)
    k = jnp.asarray(rs.randn(*ks) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(ks[-1]), jnp.float32)

    def loss_tap(x, k, b):
        return jnp.sum(jnp.sin(tap_conv2d(x, k, b, pad, precision="highest")))

    def loss_ref(x, k, b):
        return jnp.sum(jnp.sin(ref_conv(x, k, b, pad)))

    gt = jax.grad(loss_tap, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    for a, w in zip(gt, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   atol=2e-3, rtol=2e-3)


def test_auto_rule():
    assert use_tap_conv(2, 128, (1, 1))
    assert use_tap_conv(128, 1, (1, 1))
    assert not use_tap_conv(128, 256, (1, 1))
    assert not use_tap_conv(2, 128, (2, 2))  # strided: regular conv path
