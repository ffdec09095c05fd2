"""Fused IN(+gate) kernels vs XLA references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskcyclegan_vc_tpu.ops.pallas.in_gate_kernel import (
    instance_norm_fused,
    instance_norm_glu_fused,
    instance_norm_swish_fused,
)

EPS = 1e-5


def xla_in(x, scale, bias):
    mean = x.mean(axis=1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=1, keepdims=True)
    return (x - mean) / np.sqrt(var + EPS) * scale + bias


@pytest.fixture
def data():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 40, 16).astype(np.float32)
    g = rs.randn(2, 40, 16).astype(np.float32)
    s1 = rs.randn(16).astype(np.float32)
    b1 = rs.randn(16).astype(np.float32)
    s2 = rs.randn(16).astype(np.float32)
    b2 = rs.randn(16).astype(np.float32)
    return x, g, s1, b1, s2, b2


def test_in_forward(data):
    x, _, s, b, _, _ = data
    y = np.asarray(instance_norm_fused(jnp.asarray(x), jnp.asarray(s),
                                       jnp.asarray(b), True))
    np.testing.assert_allclose(y, xla_in(x, s, b), atol=1e-5)


def test_in_swish_forward(data):
    x, _, s, b, _, _ = data
    y = np.asarray(instance_norm_swish_fused(jnp.asarray(x), jnp.asarray(s),
                                             jnp.asarray(b), True))
    z = xla_in(x, s, b)
    np.testing.assert_allclose(y, z / (1 + np.exp(-z)) * 1, atol=1e-5)


def test_in_glu_forward(data):
    x, g, s1, b1, s2, b2 = data
    y = np.asarray(instance_norm_glu_fused(
        jnp.asarray(x), jnp.asarray(g), jnp.asarray(s1), jnp.asarray(b1),
        jnp.asarray(s2), jnp.asarray(b2), True))
    zh = xla_in(x, s1, b1)
    zg = xla_in(g, s2, b2)
    np.testing.assert_allclose(y, zh / (1 + np.exp(-zg)), atol=1e-5)


def _num_grad_check(f, args, idx, eps=1e-3, atol=2e-2):
    """Finite-difference check of custom VJP against numerical gradient."""
    key = jax.random.PRNGKey(0)
    loss = lambda *a: jnp.sum(jnp.sin(f(*a)))
    g_analytic = jax.grad(loss, argnums=idx)(*args)
    a = args[idx]
    rs = np.random.RandomState(1)
    for _ in range(5):
        flat_i = rs.randint(a.size)
        pert = np.zeros(a.shape, np.float32).ravel()
        pert[flat_i] = eps
        pert = pert.reshape(a.shape)
        ap = list(args)
        ap[idx] = a + pert
        am = list(args)
        am[idx] = a - pert
        num = (float(loss(*ap)) - float(loss(*am))) / (2 * eps)
        ana = float(np.asarray(g_analytic).ravel()[flat_i])
        assert abs(num - ana) < atol * max(1.0, abs(num)), (num, ana)


def test_in_backward(data):
    x, _, s, b, _, _ = data
    f = lambda x, s, b: instance_norm_fused(x, s, b, True)
    args = (jnp.asarray(x), jnp.asarray(s), jnp.asarray(b))
    for idx in (0, 1, 2):
        _num_grad_check(f, args, idx)


def test_in_swish_backward(data):
    x, _, s, b, _, _ = data
    f = lambda x, s, b: instance_norm_swish_fused(x, s, b, True)
    args = (jnp.asarray(x), jnp.asarray(s), jnp.asarray(b))
    for idx in (0, 1, 2):
        _num_grad_check(f, args, idx)


def test_in_glu_backward(data):
    x, g, s1, b1, s2, b2 = data
    f = lambda *a: instance_norm_glu_fused(*a, True)
    args = tuple(jnp.asarray(v) for v in (x, g, s1, b1, s2, b2))
    for idx in (0, 1, 2, 4):
        _num_grad_check(f, args, idx)


def test_vjp_matches_xla_autodiff(data):
    """Backward of the fused op == autodiff of the plain XLA expression."""
    x, g, s1, b1, s2, b2 = data

    def fused_loss(x, g, s1, b1, s2, b2):
        return jnp.sum(instance_norm_glu_fused(x, g, s1, b1, s2, b2, True) ** 2)

    def xla_loss(x, g, s1, b1, s2, b2):
        def _in(v, s, b):
            m = v.mean(axis=1, keepdims=True)
            var = ((v - m) ** 2).mean(axis=1, keepdims=True)
            return (v - m) * jax.lax.rsqrt(var + EPS) * s + b

        return jnp.sum((_in(x, s1, b1) * jax.nn.sigmoid(_in(g, s2, b2))) ** 2)

    args = tuple(jnp.asarray(v) for v in (x, g, s1, b1, s2, b2))
    g1 = jax.grad(fused_loss, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g2 = jax.grad(xla_loss, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-3)
