"""Training-dynamics parity vs the reference (slow; RUN_SLOW=1 to enable).

Builds the reference torch models with seeded weights, imports them into
our TrainState, then runs the SAME batch through (a) a literal torch
re-execution of the reference's iteration (train.py:195-299 semantics:
G update with joint Adam over both generators, then D update with the
updated G) and (b) our fused jitted train step at highest precision —
and requires the losses and updated weights to agree.

This pins the entire loss graph + Adam numerics, not just forwards.
"""

import os
import sys

import numpy as np
import pytest

if not os.environ.get("RUN_SLOW"):
    pytest.skip("slow full-size dynamics parity (set RUN_SLOW=1)",
                allow_module_level=True)

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maskcyclegan_vc_tpu.io.torch_import import (  # noqa: E402
    discriminator_params_from_torch,
    generator_params_from_torch,
)
from maskcyclegan_vc_tpu.train.schedules import ScheduleConfig  # noqa: E402
from maskcyclegan_vc_tpu.train.state import TrainConfig, create_train_state  # noqa: E402
from maskcyclegan_vc_tpu.train.step import make_train_step  # noqa: E402


def torch_reference_step(models, opts, batch, lam_cycle=10.0, lam_id=5.0):
    """Literal re-execution of reference train.py:195-299 (detached D step
    — detachment does not change final weights, Appendix A.2)."""
    gA2B, gB2A, dA, dB, dA2, dB2 = models
    g_opt, d_opt = opts
    real_A = torch.from_numpy(batch["real_A"])
    mask_A = torch.from_numpy(batch["mask_A"])
    real_B = torch.from_numpy(batch["real_B"])
    mask_B = torch.from_numpy(batch["mask_B"])
    ones_A = torch.ones_like(real_A)

    fake_B = gA2B(real_A, mask_A)
    cycle_A = gB2A(fake_B, torch.ones_like(fake_B))
    fake_A = gB2A(real_B, mask_B)
    cycle_B = gA2B(fake_A, torch.ones_like(fake_A))
    identity_A = gB2A(real_A, ones_A)
    identity_B = gA2B(real_B, torch.ones_like(real_B))
    d_fake_A = dA(fake_A)
    d_fake_B = dB(fake_B)
    d_fake_cycle_A = dA2(cycle_A)
    d_fake_cycle_B = dB2(cycle_B)

    cycleLoss = torch.mean(torch.abs(real_A - cycle_A)) + torch.mean(
        torch.abs(real_B - cycle_B))
    identityLoss = torch.mean(torch.abs(real_A - identity_A)) + torch.mean(
        torch.abs(real_B - identity_B))
    g_loss = (
        torch.mean((1 - d_fake_B) ** 2) + torch.mean((1 - d_fake_A) ** 2)
        + torch.mean((1 - d_fake_cycle_B) ** 2)
        + torch.mean((1 - d_fake_cycle_A) ** 2)
        + lam_cycle * cycleLoss + lam_id * identityLoss
    )
    g_opt.zero_grad(); d_opt.zero_grad()
    g_loss.backward()
    g_opt.step()

    with torch.no_grad():
        generated_A = gB2A(real_B, mask_B)
        cycled_B = gA2B(generated_A, torch.ones_like(generated_A))
        generated_B = gA2B(real_A, mask_A)
        cycled_A = gB2A(generated_B, torch.ones_like(generated_B))
    d_real_A = dA(real_A); d_real_B = dB(real_B)
    d_real_A2 = dA2(real_A); d_real_B2 = dB2(real_B)
    d_fake_A = dA(generated_A); d_fake_B = dB(generated_B)
    d_cycled_A = dA2(cycled_A); d_cycled_B = dB2(cycled_B)
    d_loss_A = (torch.mean((1 - d_real_A) ** 2) + torch.mean(d_fake_A ** 2)) / 2
    d_loss_B = (torch.mean((1 - d_real_B) ** 2) + torch.mean(d_fake_B ** 2)) / 2
    d_loss_A2 = (torch.mean((1 - d_real_A2) ** 2) + torch.mean(d_cycled_A ** 2)) / 2
    d_loss_B2 = (torch.mean((1 - d_real_B2) ** 2) + torch.mean(d_cycled_B ** 2)) / 2
    d_loss = (d_loss_A + d_loss_B) / 2 + (d_loss_A2 + d_loss_B2) / 2
    g_opt.zero_grad(); d_opt.zero_grad()
    d_loss.backward()
    d_opt.step()
    return float(g_loss), float(d_loss)


def test_one_step_dynamics_match():
    from mask_cyclegan_vc.model import Discriminator as RefD
    from mask_cyclegan_vc.model import Generator as RefG

    torch.manual_seed(0)
    gA2B, gB2A = RefG(), RefG()
    dA, dB, dA2, dB2 = RefD(), RefD(), RefD(), RefD()
    g_opt = torch.optim.Adam(
        list(gA2B.parameters()) + list(gB2A.parameters()), lr=2e-4,
        betas=(0.5, 0.999))
    d_opt = torch.optim.Adam(
        list(dA.parameters()) + list(dB.parameters())
        + list(dA2.parameters()) + list(dB2.parameters()), lr=1e-4,
        betas=(0.5, 0.999))

    cfg = TrainConfig(
        schedule=ScheduleConfig(num_epochs=100, n_samples=81, batch_size=1,
                                decay_after=10**9, stop_identity_after=10**9),
        precision="highest",
    )
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

    rs = np.random.RandomState(11)
    batch_np = {
        "real_A": rs.randn(1, 80, 64).astype(np.float32),
        "mask_A": np.ones((1, 80, 64), np.float32),
        "real_B": rs.randn(1, 80, 64).astype(np.float32),
        "mask_B": np.ones((1, 80, 64), np.float32),
    }
    batch_np["mask_A"][:, :, 30:40] = 0.0
    batch_np["mask_B"][:, :, 5:12] = 0.0

    step = jax.jit(make_train_step(cfg))
    state1, metrics = step(state, {k: jnp.asarray(v) for k, v in batch_np.items()})
    g_loss_ref, d_loss_ref = torch_reference_step(
        (gA2B, gB2A, dA, dB, dA2, dB2), (g_opt, d_opt), batch_np)

    np.testing.assert_allclose(float(metrics["g_loss"]), g_loss_ref, rtol=2e-3)
    np.testing.assert_allclose(float(metrics["d_loss"]), d_loss_ref, rtol=2e-3)

    # Updated generator weights agree (Adam normalizes grad scale, so
    # mismatched grads would diverge weights immediately).
    w_ours = np.asarray(
        state1.g_params["A2B"]["params"]["conv1"]["conv"]["kernel"]
    ).transpose(3, 2, 0, 1)
    w_ref = gA2B.state_dict()["conv1.weight"].numpy()
    diff = np.abs(w_ours - w_ref).max()
    assert diff < 5e-5, f"post-step weight divergence {diff}"
