"""fused_norms=True model paths match the XLA paths (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from maskcyclegan_vc_tpu.models import Discriminator, Generator
from maskcyclegan_vc_tpu.utils.init import fast_init


def test_generator_fused_matches_unfused():
    m0 = Generator(n_mels=8, residual_channels=8, num_residual_blocks=2)
    m1 = Generator(n_mels=8, residual_channels=8, num_residual_blocks=2,
                   fused_norms=True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8), jnp.float32)
    mask = jnp.ones_like(x)
    params = fast_init(m0, 0, x, mask)
    # identical param trees (fused path reuses the same norm params)
    p1 = fast_init(m1, 0, x, mask)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p1)
    y0 = np.asarray(m0.apply(params, x, mask))
    y1 = np.asarray(m1.apply(params, x, mask))
    np.testing.assert_allclose(y0, y1, atol=1e-5)


def test_discriminator_fused_matches_unfused():
    m0 = Discriminator(residual_channels=8)
    m1 = Discriminator(residual_channels=8, fused_norms=True)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 80, 64), jnp.float32)
    params = fast_init(m0, 0, x)
    p1 = fast_init(m1, 0, x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p1)
    y0 = np.asarray(m0.apply(params, x))
    y1 = np.asarray(m1.apply(params, x))
    np.testing.assert_allclose(y0, y1, atol=1e-5)


def test_generator_fused_grads_match():
    m0 = Generator(n_mels=8, residual_channels=8, num_residual_blocks=2)
    m1 = Generator(n_mels=8, residual_channels=8, num_residual_blocks=2,
                   fused_norms=True)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 8), jnp.float32)
    mask = jnp.ones_like(x)
    params = fast_init(m0, 0, x, mask)

    def loss(m):
        return lambda p: jnp.mean(jnp.abs(m.apply(p, x, mask)))

    g0 = jax.grad(loss(m0))(params)
    g1 = jax.grad(loss(m1))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-3)
