"""Multi-device sharding on the 8-device virtual CPU mesh.

Validates the data-parallel design without a pod (SURVEY §4 implication:
fake-mesh path). Key invariant: the sharded step computes exactly what
the single-device step computes on the same global batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskcyclegan_vc_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_train_step,
    replicate,
    shard_batch,
)
from maskcyclegan_vc_tpu.parallel.stats import collective_norm_stats
from maskcyclegan_vc_tpu.train.schedules import ScheduleConfig
from maskcyclegan_vc_tpu.train.state import TrainConfig, create_train_state
from maskcyclegan_vc_tpu.train.step import make_jit_train_step


def tiny_cfg(batch_size=8):
    return TrainConfig(
        schedule=ScheduleConfig(num_epochs=2, n_samples=16, batch_size=batch_size,
                                decay_after=8, stop_identity_after=1000),
        n_mels=8,
        num_frames=8,
        residual_channels=8,
    )


def tiny_batch(seed, b=8, m=8, t=8):
    rs = np.random.RandomState(seed)
    return {
        "real_A": jnp.asarray(rs.randn(b, m, t), jnp.float32),
        "mask_A": jnp.ones((b, m, t), jnp.float32),
        "real_B": jnp.asarray(rs.randn(b, m, t), jnp.float32),
        "mask_B": jnp.ones((b, m, t), jnp.float32),
    }


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_single_device():
    cfg = tiny_cfg()
    mesh = make_mesh()

    state_s = replicate(create_train_state(cfg, seed=0), mesh)
    step_s = make_sharded_train_step(cfg, mesh, donate=False)
    batch = tiny_batch(0)
    state_s1, metrics_s = step_s(state_s, shard_batch(batch, mesh))

    state_1 = create_train_state(cfg, seed=0)
    step_1 = jax.jit(
        __import__("maskcyclegan_vc_tpu.train.step", fromlist=["make_train_step"])
        .make_train_step(cfg)
    )
    state_11, metrics_1 = step_1(state_1, batch)

    np.testing.assert_allclose(
        float(metrics_s["g_loss"]), float(metrics_1["g_loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(metrics_s["d_loss"]), float(metrics_1["d_loss"]), rtol=2e-4
    )
    # Gradients agree (linear oracle): after the first step Adam's stored
    # first moment is (1-b1)*g, so comparing it compares the all-reduced
    # gradient directly — tight, and sensitive to wrong pmean scaling,
    # which post-Adam params are NOT (Adam is gradient-scale invariant).
    # Reduction-order noise is absolute in the magnitude of the summed
    # terms, so the tolerance scales with each leaf's dynamic range; a
    # wrong pmean scale (x8 / /8) is still orders of magnitude outside it.
    for a, b in zip(jax.tree.leaves(state_s1.g_opt[0].mu),
                    jax.tree.leaves(state_11.g_opt[0].mu)):
        b = np.asarray(b)
        tol = 2e-3 * (np.abs(b).max() + 1e-2)
        np.testing.assert_allclose(np.asarray(a), b, atol=tol)
    # Updated params agree to the Adam sign-flip bound: with b1=.5/b2=.999
    # the first update is ±lr per coordinate, and coordinates whose grad is
    # at float-noise level can legitimately flip sign between the 8-shard
    # and single-device reduction orders (|Δ| ≤ 2·lr_g = 4e-4).
    for a, b in zip(jax.tree.leaves(state_s1.g_params), jax.tree.leaves(state_11.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_sharded_step_multiple_steps_stable():
    cfg = tiny_cfg()
    mesh = make_mesh()
    state = replicate(create_train_state(cfg, seed=1), mesh)
    step = make_sharded_train_step(cfg, mesh)
    for i in range(3):
        state, metrics = step(state, shard_batch(tiny_batch(i), mesh))
        assert np.isfinite(float(metrics["g_loss"]))
    assert int(state.step) == 3


def test_sharded_checkpoint_resume(tmp_path):
    """Save under sharding, load into a fresh replicated state, continue.

    Resume must be exact: the checkpoint round-trip is lossless (f32 npz)
    and the same compiled step on the same inputs is deterministic, so
    the continued trajectory is compared bitwise against the uninterrupted
    one."""
    from maskcyclegan_vc_tpu.io.checkpoint import (
        load_checkpoint,
        load_checkpoint_meta,
        save_checkpoint,
    )

    cfg = tiny_cfg()
    mesh = make_mesh()
    state = replicate(create_train_state(cfg, seed=2), mesh)
    step = make_sharded_train_step(cfg, mesh, donate=False)
    state1, _ = step(state, shard_batch(tiny_batch(0), mesh))

    path = str(tmp_path / "00001_state.npz")
    save_checkpoint(path, jax.device_get(state1), meta={"seed": 2})

    restored = load_checkpoint(path, create_train_state(cfg, seed=99))
    assert int(restored.step) == 1
    assert int(load_checkpoint_meta(path)["seed"]) == 2
    restored = replicate(restored, mesh)

    cont_a, m_a = step(state1, shard_batch(tiny_batch(1), mesh))
    cont_b, m_b = step(restored, shard_batch(tiny_batch(1), mesh))
    assert float(m_a["g_loss"]) == float(m_b["g_loss"])
    for a, b in zip(jax.tree.leaves(cont_a.g_params),
                    jax.tree.leaves(cont_b.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shardmap_step_matches_gspmd():
    """The explicit-collective (shard_map + psum) DP step at f32 wire
    dtype is the hand-written equivalent of the GSPMD step: same synced
    gradient, same replicated update."""
    from maskcyclegan_vc_tpu.parallel.mesh import make_shardmap_train_step

    cfg = tiny_cfg()
    mesh = make_mesh()
    batch = tiny_batch(0)

    state_g = replicate(create_train_state(cfg, seed=0), mesh)
    step_g = make_sharded_train_step(cfg, mesh, donate=False)
    state_g1, m_g = step_g(state_g, shard_batch(batch, mesh))

    state_s = replicate(create_train_state(cfg, seed=0), mesh)
    step_s = make_shardmap_train_step(cfg, mesh, donate=False)
    state_s1, m_s = step_s(state_s, shard_batch(batch, mesh))

    np.testing.assert_allclose(
        float(m_s["g_loss"]), float(m_g["g_loss"]), rtol=2e-5)
    np.testing.assert_allclose(
        float(m_s["d_loss"]), float(m_g["d_loss"]), rtol=2e-5)
    # Reduction orders may differ (psum-of-local-means vs GSPMD's
    # partitioned global mean) — params agree to the Adam sign-flip
    # bound, same rationale as test_sharded_step_matches_single_device.
    for a, b in zip(jax.tree.leaves(state_s1.g_params),
                    jax.tree.leaves(state_g1.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    for a, b in zip(jax.tree.leaves(state_s1.d_params),
                    jax.tree.leaves(state_g1.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_shardmap_bf16_allreduce_bounded():
    """bf16 gradient compression: the wire-rounded update stays within
    the Adam lr bound of the f32 trajectory and trains finitely."""
    from maskcyclegan_vc_tpu.parallel.mesh import make_shardmap_train_step

    cfg = tiny_cfg()
    mesh = make_mesh()

    state_f = replicate(create_train_state(cfg, seed=0), mesh)
    step_f = make_shardmap_train_step(cfg, mesh, donate=False)
    state_c = replicate(create_train_state(cfg, seed=0), mesh)
    step_c = make_shardmap_train_step(
        cfg, mesh, allreduce_dtype="bfloat16", donate=False)

    for i in range(2):
        b = shard_batch(tiny_batch(i), mesh)
        state_f, m_f = step_f(state_f, b)
        state_c, m_c = step_c(state_c, b)
        assert np.isfinite(float(m_c["g_loss"]))
        assert np.isfinite(float(m_c["d_loss"]))

    # Each Adam update is lr-bounded per coordinate (lr_g=2e-4); two
    # steps of bf16-rounded grads can move a coordinate at most a few
    # lr from the f32 path (sign flips only at grad-noise coordinates).
    for a, b in zip(jax.tree.leaves(state_c.g_params),
                    jax.tree.leaves(state_f.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_shardmap_scan_epoch_matches_step_loop():
    """The explicit-DP scanned epoch (replicated sampling + per-device
    row slice) follows the step-at-a-time shard_map trajectory — the
    slice assignment matches shard_batch's contiguous blocks."""
    from maskcyclegan_vc_tpu.data.dataset import MelBank, sample_batch
    from maskcyclegan_vc_tpu.parallel.mesh import (
        make_shardmap_scan_epoch,
        make_shardmap_train_step,
    )

    cfg = tiny_cfg()
    mesh = make_mesh()
    rs = np.random.RandomState(0)
    bank = MelBank.from_list(
        [rs.randn(8, 40).astype(np.float32) for _ in range(4)], min_frames=8)
    base_key = jax.random.PRNGKey(5)
    n_steps, batch = 2, 8

    state_a = replicate(create_train_state(cfg, seed=0), mesh)
    step = make_shardmap_train_step(cfg, mesh, donate=False)
    losses = []
    for s in range(n_steps):
        key = jax.random.fold_in(base_key, s)
        b = sample_batch(key, bank, bank, batch, 8, 4)
        state_a, m = step(state_a, shard_batch(jax.device_get(b), mesh))
        losses.append(float(m["g_loss"]))

    state_b = replicate(create_train_state(cfg, seed=0), mesh)
    epoch = make_shardmap_scan_epoch(cfg, mesh, True, n_steps, batch, 8, 4)
    state_b, stacked = epoch(state_b, bank, bank, base_key)

    assert int(state_b.step) == n_steps
    np.testing.assert_allclose(
        np.asarray(stacked["g_loss"]), np.asarray(losses), rtol=2e-4)
    for pa, pb in zip(jax.tree.leaves(state_a.g_params),
                      jax.tree.leaves(state_b.g_params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-3)


def test_collective_norm_stats_match_numpy():
    mesh = make_mesh()
    rs = np.random.RandomState(0)
    n, m, t = 16, 8, 32
    frames = rs.randn(n, m, t).astype(np.float32)
    lengths = rs.randint(5, t + 1, size=n)
    valid = (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)

    mean, std = collective_norm_stats(
        jnp.asarray(frames), jnp.asarray(valid), mesh
    )

    # numpy oracle: concatenated valid frames (reference preprocess:39-41)
    cat = np.concatenate([frames[i, :, : lengths[i]] for i in range(n)], axis=1)
    np.testing.assert_allclose(np.asarray(mean)[:, 0], cat.mean(axis=1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(std)[:, 0], cat.std(axis=1) + 1e-9, atol=1e-5)


def test_graft_entry_single_chip():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 80, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_entry_dryrun():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_scan_epoch_matches_host_loop():
    """The GSPMD scanned epoch (on-device sampling + P('data') constraint)
    must follow the host-loop sharded trajectory: same folded keys, same
    batches, same all-reduced updates."""
    from maskcyclegan_vc_tpu.data.dataset import MelBank, sample_batch
    from maskcyclegan_vc_tpu.parallel.mesh import make_sharded_scan_epoch

    cfg = tiny_cfg()
    mesh = make_mesh()
    rs = np.random.RandomState(0)
    bank = MelBank.from_list(
        [rs.randn(8, 40).astype(np.float32) for _ in range(4)], min_frames=8)
    base_key = jax.random.PRNGKey(5)
    n_steps, batch = 2, 8

    state_a = replicate(create_train_state(cfg, seed=0), mesh)
    step = make_sharded_train_step(cfg, mesh, donate=False)
    losses = []
    s = 0
    for _ in range(n_steps):
        key = jax.random.fold_in(base_key, s)
        b = sample_batch(key, bank, bank, batch, 8, 4)
        state_a, m = step(state_a, shard_batch(jax.device_get(b), mesh))
        losses.append(float(m["g_loss"]))
        s += 1

    state_b = replicate(create_train_state(cfg, seed=0), mesh)
    epoch = make_sharded_scan_epoch(cfg, mesh, True, n_steps, batch, 8, 4)
    state_b, stacked = epoch(state_b, bank, bank, base_key)

    assert int(state_b.step) == n_steps
    np.testing.assert_allclose(
        np.asarray(stacked["g_loss"]), np.asarray(losses), rtol=2e-4)
    for pa, pb in zip(jax.tree.leaves(state_a.g_params),
                      jax.tree.leaves(state_b.g_params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-3)
