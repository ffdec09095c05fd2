"""MelGAN vocoder parity: JAX generator vs a torch oracle.

The oracle reconstructs the melgan-neurips Generator module graph
(descriptinc/melgan-neurips mel2wav/modules.py semantics: weight-norm
convs, reflection pads, dilated resnet blocks, ratios 8,8,2,2) with
random weights; the converter folds weight_norm and the JAX forward
must match.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from maskcyclegan_vc_tpu.models.melgan import (  # noqa: E402
    MelGANGenerator,
    conv_transpose1d_torch,
    melgan_params_from_torch,
)


def build_torch_melgan(n_mels=80, ngf=32, n_res=3, ratios=(8, 8, 2, 2)):
    """Oracle with the exact melgan-neurips Sequential layout."""

    class ResnetBlock(tnn.Module):
        def __init__(self, dim, dilation):
            super().__init__()
            self.block = tnn.Sequential(
                tnn.LeakyReLU(0.2),
                tnn.ReflectionPad1d(dilation),
                weight_norm(tnn.Conv1d(dim, dim, 3, dilation=dilation)),
                tnn.LeakyReLU(0.2),
                weight_norm(tnn.Conv1d(dim, dim, 1)),
            )
            self.shortcut = weight_norm(tnn.Conv1d(dim, dim, 1))

        def forward(self, x):
            return self.shortcut(x) + self.block(x)

    mult = int(2 ** len(ratios))
    model = [
        tnn.ReflectionPad1d(3),
        weight_norm(tnn.Conv1d(n_mels, mult * ngf, 7, padding=0)),
    ]
    for r in ratios:
        model += [
            tnn.LeakyReLU(0.2),
            weight_norm(
                tnn.ConvTranspose1d(
                    mult * ngf, mult * ngf // 2, 2 * r, stride=r,
                    padding=r // 2 + r % 2, output_padding=r % 2,
                )
            ),
        ]
        for j in range(n_res):
            model += [ResnetBlock(mult * ngf // 2, dilation=3 ** j)]
        mult //= 2
    model += [
        tnn.LeakyReLU(0.2),
        tnn.ReflectionPad1d(3),
        weight_norm(tnn.Conv1d(ngf, 1, 7, padding=0)),
        tnn.Tanh(),
    ]
    return tnn.Sequential(*model)


def test_conv_transpose_matches_torch():
    torch.manual_seed(0)
    for stride, k, p, op in ((8, 16, 4, 0), (2, 4, 1, 0), (3, 6, 2, 1)):
        m = tnn.ConvTranspose1d(6, 4, k, stride=stride, padding=p, output_padding=op)
        x = torch.randn(2, 6, 20)
        with torch.no_grad():
            y_ref = m(x).numpy()
        y = conv_transpose1d_torch(
            jnp.asarray(x.numpy().transpose(0, 2, 1)),
            jnp.asarray(m.weight.detach().numpy()),
            jnp.asarray(m.bias.detach().numpy()),
            stride=stride, padding=p, output_padding=op, precision="highest",
        )
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 2, 1), y_ref, atol=1e-5
        )


def test_melgan_parity():
    torch.manual_seed(1)
    # small config for CPU speed; same structure as the real one
    ref = tnn.Sequential()
    ref = build_torch_melgan(n_mels=8, ngf=4, n_res=3)
    ref.eval()

    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    params = melgan_params_from_torch(sd)

    gen = MelGANGenerator(n_mels=8, ngf=4, precision="highest")
    rs = np.random.RandomState(0)
    mel = rs.randn(2, 8, 17).astype(np.float32)

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(mel)).numpy()  # (B, 1, T*256)
    jparams = {"params": {k: jnp.asarray(v) for k, v in params["params"].items()}}
    y = np.asarray(gen.apply(jparams, jnp.asarray(mel)))
    assert y.shape == (2, 17 * 256)
    np.testing.assert_allclose(y, y_ref[:, 0], atol=2e-5)


def test_melgan_output_length_contract():
    gen = MelGANGenerator(n_mels=8, ngf=4)
    import jax
    from maskcyclegan_vc_tpu.utils.init import fast_init

    mel = jnp.zeros((1, 8, 10))
    params = gen.init(jax.random.PRNGKey(0), mel)
    y = gen.apply(params, mel)
    assert y.shape == (1, 10 * 256)
