"""Numerical parity vs. the reference PyTorch implementation.

The reference at /root/reference is imported AT RUNTIME as a golden
oracle (never copied): we instantiate its torch models with seeded
weights, import those weights into our flax models via
``io.torch_import``, and require allclose outputs on fixed inputs.
This is the BASELINE.md correctness criterion ("converted mels allclose
to reference at matched checkpoints") applied at the model level.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maskcyclegan_vc_tpu.io.torch_import import (  # noqa: E402
    discriminator_params_from_torch,
    generator_params_from_torch,
    generator_params_to_torch,
)
from maskcyclegan_vc_tpu.models import Discriminator, Generator  # noqa: E402


@pytest.fixture(scope="module")
def ref_models():
    from mask_cyclegan_vc.model import Discriminator as RefD
    from mask_cyclegan_vc.model import Generator as RefG

    torch.manual_seed(0)
    gen = RefG().eval()
    disc = RefD().eval()
    return gen, disc


def rel_err(a, b):
    return np.abs(a - b).mean() / (np.abs(a).mean() + 1e-8)


def test_generator_parity(ref_models):
    ref_gen, _ = ref_models
    params = jax.tree.map(jnp.asarray,
                          generator_params_from_torch(ref_gen.state_dict()))

    rs = np.random.RandomState(42)
    x = rs.randn(2, 80, 64).astype(np.float32)
    mask = np.ones_like(x)
    mask[:, :, 10:25] = 0.0

    with torch.no_grad():
        y_ref = ref_gen(torch.from_numpy(x), torch.from_numpy(mask)).numpy()

    y = np.asarray(Generator(precision="highest").apply(params, jnp.asarray(x), jnp.asarray(mask)))
    assert y.shape == y_ref.shape
    e = rel_err(y_ref, y)
    assert e < 2e-3, f"generator relative error {e:.2e}"


def test_generator_parity_full_length(ref_models):
    """Inference-style full-utterance forward (T=320, ones mask)."""
    ref_gen, _ = ref_models
    params = jax.tree.map(jnp.asarray,
                          generator_params_from_torch(ref_gen.state_dict()))
    rs = np.random.RandomState(7)
    x = rs.randn(1, 80, 320).astype(np.float32)
    mask = np.ones_like(x)
    with torch.no_grad():
        y_ref = ref_gen(torch.from_numpy(x), torch.from_numpy(mask)).numpy()
    y = np.asarray(Generator(precision="highest").apply(params, jnp.asarray(x), jnp.asarray(mask)))
    e = rel_err(y_ref, y)
    assert e < 2e-3, f"generator relative error {e:.2e}"


def test_discriminator_parity(ref_models):
    _, ref_disc = ref_models
    params = jax.tree.map(jnp.asarray,
                          discriminator_params_from_torch(ref_disc.state_dict()))
    rs = np.random.RandomState(43)
    x = rs.randn(2, 80, 64).astype(np.float32)
    with torch.no_grad():
        y_ref = ref_disc(torch.from_numpy(x)).numpy()  # (B,1,10,8)
    y = np.asarray(Discriminator(precision="highest").apply(params, jnp.asarray(x)))  # (B,10,8)
    np.testing.assert_allclose(y, y_ref[:, 0], atol=1e-5, rtol=1e-4)


def test_generator_roundtrip_export(ref_models):
    """flax -> torch state_dict -> flax is lossless."""
    ref_gen, _ = ref_models
    params = generator_params_from_torch(ref_gen.state_dict())
    sd = generator_params_to_torch(params)
    params2 = generator_params_from_torch(sd)
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(params2)
    assert len(flat1) == len(flat2)
    for (p1, l1), (p2, l2) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
