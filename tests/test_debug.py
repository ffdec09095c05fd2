"""Sanitizer subsystem (SURVEY §5.2): utils/debug.py and its product
wiring in the Trainer (--finite_check).

The reference has no equivalent — a diverged run silently logs NaN
losses and keeps overwriting checkpoints. Here the Trainer raises at
epoch cadence ("metrics", default) and refuses to persist a poisoned
state ("params").
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskcyclegan_vc_tpu.utils.debug import check_finite, nan_debug_mode


def test_check_finite_passes_and_names_bad_leaves():
    ok = {"a": np.ones(3), "b": {"c": jnp.zeros((2, 2))}}
    check_finite(ok, "ok")  # no raise

    bad = {"a": np.ones(3), "b": {"c": np.array([1.0, np.nan])}}
    with pytest.raises(FloatingPointError) as ei:
        check_finite(bad, "poisoned")
    assert "poisoned" in str(ei.value)
    assert "c" in str(ei.value)  # the offending leaf's path is named

    with pytest.raises(FloatingPointError):
        check_finite({"x": np.array([np.inf])})


def test_nan_debug_mode_localizes_first_nan():
    """Inside the context the first NaN-producing primitive raises
    eagerly (jax_debug_nans + disabled jit) instead of propagating."""

    def produces_nan(x):
        return jnp.log(x) * 2.0  # log(-1) -> NaN at the log, not the mul

    with nan_debug_mode():
        with pytest.raises(FloatingPointError):
            produces_nan(jnp.array(-1.0))
    # Outside the context NaNs propagate silently again.
    assert np.isnan(float(produces_nan(jnp.array(-1.0))))


@pytest.fixture(scope="module")
def tiny_trainer(tmp_path_factory):
    """A real Trainer over a 2-speaker toy corpus (R=8 model)."""
    from maskcyclegan_vc_tpu.train.trainer import Trainer, TrainerArgs

    root = tmp_path_factory.mktemp("dbg")
    rs = np.random.RandomState(0)
    for sid in ("SA", "SB"):
        d = root / "pre" / sid
        d.mkdir(parents=True)
        mels = [rs.randn(80, 96).astype(np.float32) for _ in range(2)]
        with open(d / f"{sid}_normalized.pickle", "wb") as f:
            pickle.dump(mels, f)
        np.savez(d / f"{sid}_norm_stat.npz",
                 mean=np.zeros(80, np.float32), std=np.ones(80, np.float32))
    args = TrainerArgs(
        name="dbg", save_dir=str(root / "out"), seed=0,
        speaker_A_id="SA", speaker_B_id="SB",
        preprocessed_data_dir=str(root / "pre"),
        num_epochs=1, batch_size=1, num_frames=64,
        residual_channels=8, epochs_per_save=1, epochs_per_plot=10_000,
        steps_per_print=1, dtype="float32", fused_norms="0",
        finite_check="params", async_save=False,
    )
    return Trainer(args)


def test_trainer_metrics_check_raises_with_remedy(tiny_trainer):
    tiny_trainer._check_metrics_finite({"g_loss": np.ones(3)}, epoch=7)
    with pytest.raises(FloatingPointError) as ei:
        tiny_trainer._check_metrics_finite(
            {"g_loss": np.array([1.0, np.nan, 1.0])}, epoch=7)
    assert "epoch 7" in str(ei.value)
    assert "nan_debug_mode" in str(ei.value)  # points at the localizer


def test_trainer_refuses_to_save_poisoned_state(tiny_trainer, monkeypatch):
    import maskcyclegan_vc_tpu.train.trainer as trainer_mod

    t = tiny_trainer
    # Poison one generator leaf; _save must raise BEFORE any file write.
    leaves, treedef = jax.tree_util.tree_flatten(t.state)
    bad = [np.array(l) for l in leaves]
    victim = next(b for b in bad
                  if np.issubdtype(b.dtype, np.floating) and b.size > 1)
    victim.reshape(-1)[0] = np.nan
    poisoned = jax.tree_util.tree_unflatten(treedef, bad)
    monkeypatch.setattr(t, "state", poisoned)

    calls = []
    monkeypatch.setattr(trainer_mod, "save_checkpoint",
                        lambda *a, **k: calls.append(a))
    with pytest.raises(FloatingPointError):
        t._save(1)
    assert calls == []  # the poisoned state never reached the writer

    # finite_check="metrics" skips the params sweep: the save proceeds.
    monkeypatch.setattr(t.args, "finite_check", "metrics")
    t._save(1)
    assert len(calls) == 1
