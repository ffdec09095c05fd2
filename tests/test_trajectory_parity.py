"""Multi-step training-trajectory parity vs the reference, in the default suite.

A 5-step torch-vs-JAX trajectory at small width (R=8) crossing BOTH
schedule boundaries — the per-iteration LR-decay onset
(/root/reference/mask_cyclegan_vc/train.py:306-311) and the
identity-loss cutoff (:313-315, which on our side also switches between
the identity-on/off executables exactly like train/trainer.py does) —
with ``--ref_compat_lr`` on and off. The torch side re-executes the
reference's loop against the reference's own nn.Modules (tests/_torch_ref.py);
only the generator's hardcoded ``view(B,256,20,-1)`` is generalized so a
small-R oracle can run (bit-identical at R=256).

The full-size single/multi-step pin lives in test_dynamics_parity.py
(RUN_SLOW); this test keeps the same trajectory semantics pinned on every
plain ``pytest tests/`` run in a few seconds.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from maskcyclegan_vc_tpu.io.torch_import import (  # noqa: E402
    discriminator_params_from_torch,
    generator_params_from_torch,
)
from maskcyclegan_vc_tpu.train.schedules import ScheduleConfig  # noqa: E402
from maskcyclegan_vc_tpu.train.state import TrainConfig, create_train_state  # noqa: E402
from maskcyclegan_vc_tpu.train.step import make_train_step  # noqa: E402
from tests._torch_ref import (  # noqa: E402
    ref_generator_forward,
    torch_reference_trajectory,
)

R = 8
N_STEPS = 5
DECAY_AFTER = 2  # decays applied from iteration 2 (0-based)
STOP_IDENTITY_AFTER = 3  # identity off from iteration 4


def _make_batches(n):
    rs = np.random.RandomState(3)
    batches = []
    for i in range(n):
        b = {
            "real_A": rs.randn(1, 80, 64).astype(np.float32),
            "mask_A": np.ones((1, 80, 64), np.float32),
            "real_B": rs.randn(1, 80, 64).astype(np.float32),
            "mask_B": np.ones((1, 80, 64), np.float32),
        }
        b["mask_A"][:, :, 10 + i:25 + i] = 0.0
        b["mask_B"][:, :, 40 - i:48] = 0.0
        batches.append(b)
    return batches


@pytest.mark.parametrize("ref_compat", [True, False])
def test_five_step_trajectory_matches_reference(ref_compat):
    from mask_cyclegan_vc.model import Discriminator as RefD
    from mask_cyclegan_vc.model import Generator as RefG

    torch.manual_seed(0)
    gA2B, gB2A = RefG(residual_in_channels=R), RefG(residual_in_channels=R)
    dA, dB, dA2, dB2 = (RefD(residual_in_channels=R) for _ in range(4))
    g_opt = torch.optim.Adam(
        list(gA2B.parameters()) + list(gB2A.parameters()), lr=2e-4,
        betas=(0.5, 0.999))
    d_opt = torch.optim.Adam(
        list(dA.parameters()) + list(dB.parameters())
        + list(dA2.parameters()) + list(dB2.parameters()), lr=1e-4,
        betas=(0.5, 0.999))

    sched = ScheduleConfig(
        num_epochs=N_STEPS, n_samples=1, batch_size=1,
        decay_after=DECAY_AFTER, stop_identity_after=STOP_IDENTITY_AFTER,
        ref_compat_lr=ref_compat)
    cfg = TrainConfig(schedule=sched, residual_channels=R, precision="highest")
    state = create_train_state(cfg, seed=0)
    state = state.replace(
        g_params={
            "A2B": jax.tree.map(jnp.asarray,
                                generator_params_from_torch(gA2B.state_dict())),
            "B2A": jax.tree.map(jnp.asarray,
                                generator_params_from_torch(gB2A.state_dict())),
        },
        d_params={
            k: jax.tree.map(jnp.asarray,
                            discriminator_params_from_torch(m.state_dict()))
            for k, m in (("A", dA), ("B", dB), ("A2", dA2), ("B2", dB2))
        },
    )

    batches = _make_batches(N_STEPS)

    # Ours: trainer-style static executable switch at the identity cutoff.
    step_fns = {}
    ours, id_losses = [], []
    for i, b in enumerate(batches):
        wi = i <= STOP_IDENTITY_AFTER  # train/trainer.py _identity_cutoff
        if wi not in step_fns:
            step_fns[wi] = jax.jit(make_train_step(cfg, with_identity=wi))
        state, metrics = step_fns[wi](state, {k: jnp.asarray(v)
                                              for k, v in b.items()})
        ours.append((float(metrics["g_loss"]), float(metrics["d_loss"])))
        id_losses.append(float(metrics["g_identity_loss"]))

    theirs = torch_reference_trajectory(
        (gA2B, gB2A, dA, dB, dA2, dB2), (g_opt, d_opt), batches,
        generator_lr=2e-4, discriminator_lr=1e-4, total_steps=N_STEPS,
        decay_after=DECAY_AFTER, stop_identity_after=STOP_IDENTITY_AFTER,
        ref_compat=ref_compat, gen_forward=ref_generator_forward)

    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), rtol=2e-3)

    # Post-trajectory weights: Adam normalizes per-coordinate step sizes, so
    # any schedule mismatch (wrong lr on the wrong optimizer at the wrong
    # step) shows up here at O(lr) immediately.
    w_ours = np.asarray(
        state.g_params["A2B"]["params"]["conv1"]["conv"]["kernel"]
    ).transpose(3, 2, 0, 1)
    w_ref = gA2B.state_dict()["conv1.weight"].numpy()
    assert np.abs(w_ours - w_ref).max() < 5e-5
    wd_ours = np.asarray(
        state.d_params["A"]["params"]["convLayer1"]["conv"]["kernel"]
    ).transpose(3, 2, 0, 1)
    wd_ref = dA.state_dict()["convLayer1.0.weight"].numpy()
    assert np.abs(wd_ours - wd_ref).max() < 5e-5

    # The identity cutoff actually bit inside the window (term present
    # before, gone after — and both executables were exercised).
    assert id_losses[0] > 0.0 and id_losses[-1] == 0.0
    assert set(step_fns) == {True, False}
