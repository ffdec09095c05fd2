"""bf16+fused-norms training dynamics sanity (round-4 directive 7).

The production TPU default (bfloat16 compute + Pallas fused norms) has
forward parity and compiled-kernel checks, but training in a reduced
dtype can go wrong in ways a single forward can't show (grad underflow,
norm-stat drift, loss divergence over steps). This pins a 20-step
small-R trajectory of the bf16+fused path against the f32/XLA path on
the SAME batch stream: losses stay finite, track each other within a
bounded relative gap, and both trajectories improve the same way.
"""

import jax
import jax.numpy as jnp
import numpy as np

from maskcyclegan_vc_tpu.train.schedules import ScheduleConfig
from maskcyclegan_vc_tpu.train.state import TrainConfig, create_train_state
from maskcyclegan_vc_tpu.train.step import make_jit_train_step

N_STEPS = 20


def _cfg(dtype, fused):
    return TrainConfig(
        schedule=ScheduleConfig(num_epochs=50, n_samples=16, batch_size=2,
                                decay_after=10**6, stop_identity_after=10**6),
        n_mels=8,
        num_frames=8,
        residual_channels=8,
        dtype=dtype,
        fused_norms=fused,
    )


def _batches():
    rs = np.random.RandomState(3)
    out = []
    for i in range(N_STEPS):
        b = {
            "real_A": jnp.asarray(rs.randn(2, 8, 8), jnp.float32),
            "mask_A": np.ones((2, 8, 8), np.float32),
            "real_B": jnp.asarray(rs.randn(2, 8, 8), jnp.float32),
            "mask_B": np.ones((2, 8, 8), np.float32),
        }
        b["mask_A"][:, :, 2:4 + i % 3] = 0.0
        b["mask_A"] = jnp.asarray(b["mask_A"])
        b["mask_B"] = jnp.asarray(b["mask_B"])
        out.append(b)
    return out


def _run(cfg):
    state = create_train_state(cfg, seed=0)
    step = make_jit_train_step(cfg)
    g_losses, d_losses = [], []
    for b in _batches():
        state, m = step(state, b)
        g_losses.append(float(m["g_loss"]))
        d_losses.append(float(m["d_loss"]))
    return np.array(g_losses), np.array(d_losses)


def test_bf16_fused_trajectory_tracks_f32():
    g32, d32 = _run(_cfg(None, False))
    g16, d16 = _run(_cfg(jnp.bfloat16, True))

    assert np.isfinite(g16).all() and np.isfinite(d16).all()
    assert np.isfinite(g32).all() and np.isfinite(d32).all()

    # Same trend: the generator objective (cycle + identity dominated at
    # these scales) must improve over the window in BOTH dtypes.
    assert g32[-5:].mean() < g32[:5].mean()
    assert g16[-5:].mean() < g16[:5].mean()

    # Bounded gap: bf16 rounding perturbs each step, and Adam amplifies
    # per-coordinate noise, but the loss curves must track within a
    # modest relative band throughout (not just at the end).
    rel = np.abs(g16 - g32) / np.abs(g32)
    assert rel.max() < 0.15, f"g_loss diverged: max rel gap {rel.max():.3f}"
    rel_d = np.abs(d16 - d32) / np.abs(d32)
    assert rel_d.max() < 0.15, f"d_loss diverged: max rel gap {rel_d.max():.3f}"
