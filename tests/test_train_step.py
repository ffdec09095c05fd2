"""Train-step semantics on a tiny model (fast on the CPU test mesh)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskcyclegan_vc_tpu.train.schedules import (
    ScheduleConfig,
    discriminator_lr,
    generator_lr,
    identity_lambda,
)
from maskcyclegan_vc_tpu.train.state import TrainConfig, create_train_state
from maskcyclegan_vc_tpu.train.step import make_jit_train_step


def tiny_cfg(**over):
    sched_kw = dict(num_epochs=10, n_samples=4, batch_size=2, decay_after=4,
                    stop_identity_after=4)
    sched_kw.update(over.pop("sched", {}))
    sched = ScheduleConfig(**sched_kw)
    return TrainConfig(
        schedule=sched,
        n_mels=8,
        num_frames=8,
        residual_channels=8,
        **over,
    )


def tiny_batch(seed=0, b=2, m=8, t=8):
    rs = np.random.RandomState(seed)
    return {
        "real_A": jnp.asarray(rs.randn(b, m, t), jnp.float32),
        "mask_A": jnp.ones((b, m, t), jnp.float32),
        "real_B": jnp.asarray(rs.randn(b, m, t), jnp.float32),
        "mask_B": jnp.ones((b, m, t), jnp.float32),
    }


# ---------- schedules ----------

def simulate_reference_lrs(cfg: ScheduleConfig, n_iters):
    """Literal re-simulation of reference train.py:139-155,306-311 semantics."""
    g_lr, d_lr = cfg.generator_lr, cfg.discriminator_lr
    g_used, d_used = [], []
    global_step = 0
    for i in range(n_iters):
        g_used.append(g_lr)
        d_used.append(d_lr)
        global_step += cfg.batch_size
        if global_step > cfg.decay_after:
            g_lr = max(0.0, g_lr - cfg.generator_lr_decay)
            d_lr = max(0.0, d_lr - cfg.discriminator_lr_decay)
    return g_used, d_used


def test_lr_schedule_matches_reference_semantics():
    cfg = ScheduleConfig(num_epochs=3, n_samples=10, batch_size=2, decay_after=8)
    g_sim, d_sim = simulate_reference_lrs(cfg, 30)
    for i in range(30):
        np.testing.assert_allclose(float(generator_lr(cfg, i)), g_sim[i], rtol=1e-6, atol=1e-10)
        np.testing.assert_allclose(float(discriminator_lr(cfg, i)), d_sim[i], rtol=1e-6, atol=1e-10)


def test_lr_schedule_ref_compat_bug():
    cfg = ScheduleConfig(num_epochs=3, n_samples=10, batch_size=1, decay_after=5,
                         ref_compat_lr=True)
    # Before decay: nominal lrs.
    np.testing.assert_allclose(float(generator_lr(cfg, 3)), cfg.generator_lr, rtol=1e-6)
    np.testing.assert_allclose(float(discriminator_lr(cfg, 3)), cfg.discriminator_lr, rtol=1e-6)
    # After decay: G follows the *discriminator's* decaying schedule
    # (Appendix A bug 1), D never decays.
    n = 10 - 5
    expect_g = cfg.discriminator_lr - n * cfg.discriminator_lr_decay
    np.testing.assert_allclose(float(generator_lr(cfg, 10)), expect_g, rtol=1e-5)
    np.testing.assert_allclose(float(discriminator_lr(cfg, 10)), cfg.discriminator_lr, rtol=1e-6)


def test_identity_lambda_cutoff():
    cfg = ScheduleConfig(stop_identity_after=10, batch_size=2)
    assert float(identity_lambda(cfg, 5)) == cfg.identity_loss_lambda
    assert float(identity_lambda(cfg, 6)) == 0.0


# ---------- train step ----------

@pytest.fixture(scope="module")
def stepped():
    cfg = tiny_cfg()
    state0 = create_train_state(cfg, seed=0)
    # Snapshot before stepping: the jitted step donates its input state.
    g0 = jax.tree.map(np.asarray, state0.g_params)
    d0 = jax.tree.map(np.asarray, state0.d_params)
    step = make_jit_train_step(cfg)
    state1, m1 = step(state0, tiny_batch(0))
    g1 = jax.tree.map(np.asarray, state1.g_params)
    state2, m2 = step(state1, tiny_batch(1))
    return cfg, g0, d0, g1, state2, m1, m2


def test_step_increments_and_finite(stepped):
    cfg, g0, d0, g1, s2, m1, m2 = stepped
    assert int(s2.step) == 2
    for k, v in {**m1, **m2}.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(m1["g_loss"]) > 0 and float(m1["d_loss"]) > 0


def test_params_update(stepped):
    cfg, g0, d0, g1, *_ = stepped
    l0, l1 = jax.tree.leaves(g0), jax.tree.leaves(g1)
    changed = sum(not np.allclose(a, b) for a, b in zip(l0, l1))
    assert changed > len(l0) * 0.9


def test_dead_params_untouched(stepped):
    cfg, g0, d0, g1, s2, *_ = stepped
    for name in ("A", "B", "A2", "B2"):
        p0 = d0[name]["params"]
        p2 = s2.d_params[name]["params"]
        for k in ("downSample4_conv_kernel", "downSample4_conv_bias",
                  "downSample4_norm_scale", "downSample4_norm_bias"):
            np.testing.assert_array_equal(p0[k], np.asarray(p2[k]))


def test_identity_loss_active_then_off():
    sched = dict(stop_identity_after=2)  # batch 2 -> off from step 2
    cfg = tiny_cfg(sched=sched)
    state = create_train_state(cfg, seed=1)
    step = make_jit_train_step(cfg)
    state, m0 = step(state, tiny_batch(2))
    assert float(m0["identity_lambda"]) == 5.0
    assert float(m0["g_identity_loss"]) > 0.0
    state, m1 = step(state, tiny_batch(3))
    state, m2 = step(state, tiny_batch(4))
    assert float(m2["identity_lambda"]) == 0.0
    assert float(m2["g_identity_loss"]) == 0.0


def test_identity_executable_switch_is_exact():
    """Past the identity cutoff the with/without-identity executables
    must produce equal updates (lambda is 0 there, so the identity terms
    are weighted away; the no-identity variant just drops them). The two
    executables batch same-params generator forwards differently (the
    identity rows ride along in the with-identity variant), so XLA may
    tile their contractions differently — equality is at f32
    accumulation tolerance, not bitwise."""
    import jax

    from maskcyclegan_vc_tpu.train.state import create_train_state
    from maskcyclegan_vc_tpu.train.step import make_jit_train_step

    cfg = tiny_cfg()
    cutoff = cfg.schedule.stop_identity_after // cfg.schedule.batch_size
    state = create_train_state(cfg, seed=0)
    # Advance the step counter past the cutoff.
    state = state.replace(step=jnp.asarray(cutoff + 1, jnp.int32))
    batch = tiny_batch(0)

    s_on, m_on = make_jit_train_step(cfg, with_identity=True)(
        jax.device_get(state), batch)
    s_off, m_off = make_jit_train_step(cfg, with_identity=False)(
        jax.device_get(state), batch)
    assert float(m_on["identity_lambda"]) == 0.0
    np.testing.assert_allclose(float(m_on["g_loss"]), float(m_off["g_loss"]),
                               rtol=1e-5)
    # Post-Adam weights: a float-noise gradient difference moves a
    # near-zero-gradient coordinate by up to ~lr (m/sqrt(v) ~ +-1), so
    # the meaningful bound is the Adam step quantum, not float tolerance
    # (same rationale as tests/test_dynamics_parity.py).
    for a, b in zip(jax.tree.leaves(s_on.g_params), jax.tree.leaves(s_off.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=6e-4)


def test_scan_epoch_matches_step_loop():
    """The scanned epoch must follow the exact per-step trajectory: same
    fold_in(base_key, state.step) keys -> same sampled batches -> same
    updates (tolerances cover compilation-order float noise only)."""
    import jax

    from maskcyclegan_vc_tpu.data.dataset import MelBank, sample_batch
    from maskcyclegan_vc_tpu.train.state import create_train_state
    from maskcyclegan_vc_tpu.train.step import make_jit_train_step, make_scan_epoch

    cfg = tiny_cfg()
    rs = np.random.RandomState(0)
    bank = MelBank.from_list(
        [rs.randn(8, 40).astype(np.float32) for _ in range(4)], min_frames=8)
    base_key = jax.random.PRNGKey(3)
    n_steps, batch, n_frames, mml = 3, 2, 8, 4

    state_a = create_train_state(cfg, seed=0)
    step_fn = make_jit_train_step(cfg)
    metrics_loop = []
    step = int(state_a.step)
    for _ in range(n_steps):
        key = jax.random.fold_in(base_key, step)
        b = sample_batch(key, bank, bank, batch, n_frames, mml)
        state_a, m = step_fn(state_a, b)
        metrics_loop.append(float(m["g_loss"]))
        step += 1

    state_b = create_train_state(cfg, seed=0)
    epoch_fn = make_scan_epoch(cfg, True, n_steps, batch, n_frames, mml)
    state_b, stacked = epoch_fn(state_b, bank, bank, base_key)

    assert int(state_b.step) == n_steps
    np.testing.assert_allclose(
        np.asarray(stacked["g_loss"]), np.asarray(metrics_loop), rtol=2e-4)
    for pa, pb in zip(jax.tree.leaves(state_a.g_params),
                      jax.tree.leaves(state_b.g_params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-3)


def test_with_eval_fake_exports_updated_conversion():
    """metrics['fake_B_eval'] must be the A->B conversion of real_A under
    the UPDATED generator — the tensor the in-loop vocoder decodes
    (bench config 5), identical to a post-step forward."""
    import jax

    from maskcyclegan_vc_tpu.train.state import build_models, create_train_state
    from maskcyclegan_vc_tpu.train.step import make_train_step

    cfg = tiny_cfg()
    state = create_train_state(cfg, seed=0)
    batch = tiny_batch(5, b=2)
    step = jax.jit(make_train_step(cfg, with_eval_fake=True))
    new_state, metrics = step(state, batch)
    gen, _ = build_models(cfg)
    want = gen.apply(new_state.g_params["A2B"], batch["real_A"],
                     batch["mask_A"])
    # In-step the conversion rides the pair-batched D-step forward, so
    # XLA may tile it differently than this standalone apply — compare
    # at f32 accumulation tolerance.
    np.testing.assert_allclose(np.asarray(metrics["fake_B_eval"]),
                               np.asarray(want), atol=1e-4)


def test_pair_forwards_on_off_equivalent():
    """The pair-batched graph (auto below batch 16) and the unbatched
    graph (large-batch default) are the same computation: losses match
    at float tolerance and post-Adam weights within the step quantum.
    The unbatched branch otherwise only runs at bench-scale batches."""
    import dataclasses

    import jax

    batch = tiny_batch(7, b=2)
    results = {}
    for pair in (True, False):
        cfg = dataclasses.replace(tiny_cfg(), pair_forwards=pair)
        state = create_train_state(cfg, seed=0)
        st, m = make_jit_train_step(cfg)(state, batch)
        results[pair] = (st, m)
    m_on, m_off = results[True][1], results[False][1]
    np.testing.assert_allclose(float(m_on["g_loss"]), float(m_off["g_loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_on["d_loss"]), float(m_off["d_loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(results[True][0].g_params),
                    jax.tree.leaves(results[False][0].g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=6e-4)
