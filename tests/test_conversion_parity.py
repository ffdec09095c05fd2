"""End-to-end conversion parity: cli/test's bucketed full-utterance path
vs the reference PyTorch generator at matched weights.

This is the BASELINE.md correctness criterion at the pipeline level:
variable-length utterances, ones mask, bucket padding + masked
InstanceNorm on our side vs the reference's exact-length forward.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maskcyclegan_vc_tpu.cli.test import convert_utterance  # noqa: E402
from maskcyclegan_vc_tpu.io.torch_import import generator_params_from_torch  # noqa: E402
from maskcyclegan_vc_tpu.models import Generator  # noqa: E402


def test_bucketed_conversion_matches_reference():
    from mask_cyclegan_vc.model import Generator as RefG

    torch.manual_seed(5)
    ref = RefG().eval()
    params = jax.tree.map(jnp.asarray,
                          generator_params_from_torch(ref.state_dict()))
    gen = Generator(precision="highest")

    rs = np.random.RandomState(9)
    for t in (64, 100, 257):  # aligned, even, odd utterance lengths
        mel = rs.randn(80, t).astype(np.float32)
        ours = convert_utterance(gen, params, mel)
        assert ours.shape == (80, t)
        with torch.no_grad():
            x = torch.from_numpy(mel[None])
            y_ref = ref(x, torch.ones_like(x)).numpy()[0]
        # The reference output width for t%4!=0 exceeds t (upsample
        # rounding); ours is cropped to t — compare the overlap away from
        # the right boundary (reference pads with zeros there, we mask).
        n = min(t, y_ref.shape[1]) - 4
        e = np.abs(ours[:, :n] - y_ref[:, :n]).mean() / (
            np.abs(y_ref[:, :n]).mean() + 1e-8)
        assert e < 5e-3, f"T={t}: relative error {e:.2e}"
