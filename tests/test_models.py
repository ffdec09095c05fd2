"""Shape and parameter-count contracts for Generator/Discriminator.

Counts come from the reference architecture (SURVEY §2.4, derived from
/root/reference/mask_cyclegan_vc/model.py:106-327): G 24,537,729;
D 16,691,713 incl. the dead downSample4 block (10,488,832 params).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskcyclegan_vc_tpu.models import Discriminator, Generator
from maskcyclegan_vc_tpu.utils.init import fast_init


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.fixture(scope="session")
def gen():
    model = Generator()
    x = jnp.zeros((2, 80, 64))
    params = fast_init(model, 0, x, jnp.ones_like(x))
    apply = jax.jit(lambda p, x, m: model.apply(p, x, m))
    return model, params, apply


@pytest.fixture(scope="session")
def disc():
    model = Discriminator()
    x = jnp.zeros((2, 80, 64))
    params = fast_init(model, 0, x)
    apply = jax.jit(lambda p, x: model.apply(p, x))
    return model, params, apply


def test_generator_param_count(gen):
    assert n_params(gen[1]) == 24_537_729


def test_discriminator_param_count(disc):
    assert n_params(disc[1]) == 16_691_713


def test_discriminator_param_count_no_dead():
    model = Discriminator(include_dead_params=False)
    params = fast_init(model, 0, jnp.zeros((1, 80, 64)))
    assert n_params(params) == 16_691_713 - 10_488_832


def test_generator_shapes(gen):
    model, params, apply = gen
    x = jnp.asarray(np.random.RandomState(0).randn(2, 80, 64), jnp.float32)
    y = apply(params, x, jnp.ones_like(x))
    assert y.shape == (2, 80, 64)
    assert y.dtype == jnp.float32
    assert np.isfinite(np.asarray(y)).all()


def test_generator_variable_length(gen):
    """Fully convolutional in time: any T%4==0 round-trips the shape."""
    model, params, _ = gen
    x = jnp.asarray(np.random.RandomState(1).randn(1, 80, 128), jnp.float32)
    y = jax.jit(lambda p, x, m: model.apply(p, x, m))(params, x, jnp.ones_like(x))
    assert y.shape == (1, 80, 128)


def test_generator_masked_inference_matches_unpadded(gen):
    """Bucketed inference: a T=64 utterance padded into a T=128 bucket with
    masked InstanceNorm must closely match the unpadded forward."""
    model, params, apply = gen
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 80, 64), jnp.float32)
    y_ref = apply(params, x, jnp.ones_like(x))

    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 64)))
    yp = jax.jit(lambda p, x, m, l: model.apply(p, x, m, lengths=l))(
        params, xp, jnp.ones_like(xp), jnp.array([64])
    )
    np.testing.assert_array_equal(np.asarray(yp[:, :, 64:]), 0.0)
    # The bucketed forward equals the unpadded one up to float
    # reassociation in the norm reductions; at random init ~20 chained
    # IN+gate layers amplify that 1e-8 seed error chaotically, so the
    # full-size bound is loose. test_masked_inference_exact_small pins
    # the tight bound on a shallow model.
    valid_ref = np.asarray(y_ref)
    valid_pad = np.asarray(yp[:, :, :64])
    err = np.abs(valid_ref - valid_pad).mean()
    scale = np.abs(valid_ref).mean() + 1e-6
    assert err / scale < 0.05, f"relative error {err / scale:.6f}"


def test_masked_inference_exact_small():
    """On a shallow generator the bucketed forward is exact to float eps."""
    model = Generator(n_mels=8, residual_channels=8, num_residual_blocks=2)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 8, 8), jnp.float32)
    params = fast_init(model, 0, x, jnp.ones_like(x))
    y = np.asarray(model.apply(params, x, jnp.ones_like(x)))
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 8)))
    yp = np.asarray(
        model.apply(params, xp, jnp.ones_like(xp), lengths=jnp.array([8]))
    )[:, :, :8]
    np.testing.assert_allclose(y, yp, atol=1e-6)


def test_generator_mask_is_used(gen):
    _, params, apply = gen
    x = jnp.asarray(np.random.RandomState(3).randn(2, 80, 64), jnp.float32)
    mask = jnp.ones_like(x).at[:, :, 20:30].set(0.0)
    y0 = apply(params, x, jnp.ones_like(x))
    y1 = apply(params, x, mask)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_discriminator_shapes(disc):
    _, params, apply = disc
    x = jnp.asarray(np.random.RandomState(4).randn(2, 80, 64), jnp.float32)
    y = apply(params, x)
    assert y.shape == (2, 10, 8)
    arr = np.asarray(y)
    assert ((arr >= 0) & (arr <= 1)).all(), "sigmoid output expected"


def test_discriminator_odd_time(disc):
    model, params, _ = disc
    x = jnp.asarray(np.random.RandomState(5).randn(1, 80, 100), jnp.float32)
    y = jax.jit(lambda p, x: model.apply(p, x))(params, x)
    assert y.shape == (1, 10, 13)  # ceil(100/8) through three stride-2 convs


def test_discriminator_masked_eval_exact_small():
    """Bucketed masked D eval is EXACT vs the unpadded forward (§5.7).

    T=24 is not a multiple of 8, so every stride boundary and the final
    k(1,3) conv read across the valid/invalid edge — the leak cases.
    """
    model = Discriminator(residual_channels=8, include_dead_params=False)
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(1, 16, 24), jnp.float32)
    params = fast_init(model, 0, x)
    y = np.asarray(model.apply(params, x))  # (1, 2, 3)

    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 8)))  # bucket to T=32
    yp = np.asarray(model.apply(params, xp, lengths=jnp.array([24])))
    assert yp.shape == (1, 2, 4)
    np.testing.assert_array_equal(yp[:, :, 3:], 0.0)  # invalid patches zeroed
    np.testing.assert_allclose(y, yp[:, :, :3], atol=1e-6)


def test_discriminator_masked_eval_full_size(disc):
    """Full-size masked eval: padded T=100 -> bucket 128 matches unpadded."""
    model, params, _ = disc
    rs = np.random.RandomState(8)
    x = jnp.asarray(rs.randn(2, 80, 100), jnp.float32)
    y = np.asarray(jax.jit(lambda p, x: model.apply(p, x))(params, x))

    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 28)))
    yp = np.asarray(jax.jit(
        lambda p, x, l: model.apply(p, x, lengths=l)
    )(params, xp, jnp.array([100, 100])))
    assert yp.shape == (2, 10, 16)
    np.testing.assert_array_equal(yp[:, :, 13:], 0.0)
    # ~4 chained IN stages amplify f32 reassociation noise; stay tight.
    np.testing.assert_allclose(y, yp[:, :, :13], atol=2e-5)


def test_discriminator_masked_ragged_batch(disc):
    """Two different lengths in one bucket, each row exact vs unpadded."""
    model, params, _ = disc
    rs = np.random.RandomState(9)
    a = jnp.asarray(rs.randn(1, 80, 64), jnp.float32)
    b = jnp.asarray(rs.randn(1, 80, 48), jnp.float32)
    ya = np.asarray(model.apply(params, a))
    yb = np.asarray(model.apply(params, b))

    xp = jnp.concatenate(
        [a, jnp.pad(b, ((0, 0), (0, 0), (0, 16)))], axis=0)
    yp = np.asarray(model.apply(params, xp, lengths=jnp.array([64, 48])))
    np.testing.assert_allclose(ya[0], yp[0, :, :8], atol=2e-5)
    np.testing.assert_allclose(yb[0], yp[1, :, :6], atol=2e-5)
    np.testing.assert_array_equal(yp[1, :, 6:], 0.0)


def test_k3_matmul_variant_matches_conv():
    """ResidualBlock's shifted-matmul k3 path == the lax.conv path
    (same params, highest precision) — the perf A/B must be a pure
    lowering change, not a numerics change."""
    rs = np.random.RandomState(10)
    x = jnp.asarray(rs.randn(2, 80, 64), jnp.float32)
    m = jnp.ones_like(x)
    g0 = Generator(n_mels=80, residual_channels=16, num_residual_blocks=2,
                   precision="highest")
    g1 = Generator(n_mels=80, residual_channels=16, num_residual_blocks=2,
                   precision="highest", k3_matmul=True)
    params = fast_init(g0, 0, x, m)
    y0 = np.asarray(g0.apply(params, x, m))
    y1 = np.asarray(g1.apply(params, x, m))  # identical param tree
    np.testing.assert_allclose(y0, y1, atol=2e-5, rtol=1e-5)


def test_split_gated_conv_variant_matches_paired():
    """GatedConv2d.split_pair A/B == the paired-conv path bit-for-bit at
    highest precision (same dot products, different emitter grouping)."""
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(1, 80, 64), jnp.float32)
    m = jnp.ones_like(x)
    g0 = Generator(n_mels=80, residual_channels=16, num_residual_blocks=2,
                   precision="highest")
    g1 = Generator(n_mels=80, residual_channels=16, num_residual_blocks=2,
                   precision="highest", split_gated_conv=True)
    params = fast_init(g0, 0, x, m)
    np.testing.assert_allclose(np.asarray(g0.apply(params, x, m)),
                               np.asarray(g1.apply(params, x, m)),
                               atol=1e-6)
