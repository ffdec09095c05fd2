"""Checkpoint save/load/rotate + reference .pth.tar ingestion."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskcyclegan_vc_tpu.io.checkpoint import (
    checkpoint_path,
    import_reference_checkpoints,
    latest_epoch,
    load_checkpoint,
    rotate_checkpoints,
    save_checkpoint,
)
from maskcyclegan_vc_tpu.train.schedules import ScheduleConfig
from maskcyclegan_vc_tpu.train.state import TrainConfig, create_train_state


def tiny_cfg():
    return TrainConfig(
        schedule=ScheduleConfig(num_epochs=2, n_samples=4, batch_size=2,
                                decay_after=4, stop_identity_after=4),
        n_mels=8, num_frames=8, residual_channels=8,
    )


def test_roundtrip(tmp_path):
    state = create_train_state(tiny_cfg(), seed=0)
    p = checkpoint_path(str(tmp_path), 7)
    save_checkpoint(p, state)
    assert latest_epoch(str(tmp_path)) == 7

    other = create_train_state(tiny_cfg(), seed=9)
    restored = load_checkpoint(p, other)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_saver_roundtrip_and_ordering(tmp_path):
    """AsyncSaver writes the identical atomic file; a second save joins
    the first (one write in flight), and wait() flushes."""
    from maskcyclegan_vc_tpu.io.checkpoint import AsyncSaver

    state = create_train_state(tiny_cfg(), seed=0)
    host = jax.device_get(state)
    saver = AsyncSaver()
    done = []
    saver.save(checkpoint_path(str(tmp_path), 1), host, {"seed": 0},
               on_done=lambda: done.append(1))
    saver.save(checkpoint_path(str(tmp_path), 2), host, {"seed": 0},
               on_done=lambda: done.append(2))
    saver.wait()
    assert done == [1, 2]
    assert latest_epoch(str(tmp_path)) == 2
    restored = load_checkpoint(
        checkpoint_path(str(tmp_path), 1), create_train_state(tiny_cfg(), 9))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # no stray .tmp files
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]


def test_async_saver_surfaces_write_errors(tmp_path):
    from maskcyclegan_vc_tpu.io.checkpoint import AsyncSaver

    saver = AsyncSaver()
    # Unwritable destination: parent is a FILE, so mkdir/open fails in
    # the worker; the error must re-raise on wait(), not vanish.
    blocker = tmp_path / "blocked"
    blocker.write_text("x")
    saver.save(str(blocker / "00001_state.npz"), {"a": np.zeros(2)})
    with pytest.raises(Exception):
        saver.wait()
    saver.wait()  # error consumed; saver reusable


def test_atomic_no_partial(tmp_path):
    state = create_train_state(tiny_cfg(), seed=0)
    p = checkpoint_path(str(tmp_path), 1)
    save_checkpoint(p, state)
    assert not os.path.exists(p + ".tmp")


def test_shape_mismatch_rejected(tmp_path):
    state = create_train_state(tiny_cfg(), seed=0)
    p = checkpoint_path(str(tmp_path), 1)
    save_checkpoint(p, state)
    bigger = create_train_state(
        TrainConfig(schedule=tiny_cfg().schedule, n_mels=8, num_frames=8,
                    residual_channels=16), seed=0)
    with pytest.raises((ValueError, KeyError)):
        load_checkpoint(p, bigger)


def test_rotation(tmp_path):
    state = create_train_state(tiny_cfg(), seed=0)
    for e in (1, 2, 3, 4):
        save_checkpoint(checkpoint_path(str(tmp_path), e), state)
    rotate_checkpoints(str(tmp_path), max_ckpts=2)
    assert latest_epoch(str(tmp_path)) == 4
    names = sorted(os.listdir(tmp_path))
    assert names == ["00003_state.npz", "00004_state.npz"]


def test_import_reference_checkpoints(tmp_path):
    """Full-size: write reference-format .pth.tar files from seeded torch
    models, ingest, and check a leaf matches."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from mask_cyclegan_vc.model import Discriminator as RefD
    from mask_cyclegan_vc.model import Generator as RefG

    torch.manual_seed(3)
    models = {
        "generator_A2B": RefG(),
        "generator_B2A": RefG(),
        "discriminator_A": RefD(),
        "discriminator_B": RefD(),
        "discriminator_A2": RefD(),
        "discriminator_B2": RefD(),
    }
    epoch = 500
    for name, m in models.items():
        torch.save(
            {"ckpt_info": {"epoch": epoch}, "model_state": m.state_dict()},
            os.path.join(tmp_path, f"{epoch:05d}_{name}.pth.tar"),
        )

    cfg = TrainConfig(schedule=ScheduleConfig())  # full-size
    state = create_train_state(cfg, seed=0)
    state, e = import_reference_checkpoints(str(tmp_path), epoch, state)
    assert e == epoch

    w_ref = models["generator_A2B"].state_dict()["conv1.weight"].numpy()
    w_ours = np.asarray(
        state.g_params["A2B"]["params"]["conv1"]["conv"]["kernel"]
    ).transpose(3, 2, 0, 1)
    np.testing.assert_array_equal(w_ref, w_ours)
    w_dead = models["discriminator_B2"].state_dict()["downSample4.0.weight"].numpy()
    d_ours = np.asarray(
        state.d_params["B2"]["params"]["downSample4_conv_kernel"]
    ).transpose(3, 2, 0, 1)
    np.testing.assert_array_equal(w_dead, d_ours)


def test_load_checkpoint_subtree_matches_full_load(tmp_path):
    """Subtree read (one generator) == the same leaves from a full load."""
    import jax

    from maskcyclegan_vc_tpu.io.checkpoint import (
        load_checkpoint,
        load_checkpoint_subtree,
        save_checkpoint,
    )
    from maskcyclegan_vc_tpu.train.schedules import ScheduleConfig
    from maskcyclegan_vc_tpu.train.state import TrainConfig, create_train_state

    cfg = TrainConfig(schedule=ScheduleConfig(), n_mels=8, num_frames=8,
                      residual_channels=8)
    state = create_train_state(cfg, seed=3)
    p = str(tmp_path / "00001_state.npz")
    save_checkpoint(p, jax.device_get(state), meta={"seed": 3})

    sub = load_checkpoint_subtree(p, "g_params/A2B")
    full = load_checkpoint(p, state)
    flat_sub = jax.tree_util.tree_leaves_with_path(sub)
    flat_full = dict(
        ("/".join(str(getattr(k, "key", k)) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(
            full.g_params["A2B"]))
    assert len(flat_sub) == len(flat_full) > 0
    for path, leaf in flat_sub:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_full[key]))

    with pytest.raises(KeyError):
        load_checkpoint_subtree(p, "nonexistent/prefix")
