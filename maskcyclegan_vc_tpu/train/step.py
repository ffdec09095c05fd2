"""The fused two-sided CycleGAN training step.

One jitted function implements the reference's full per-iteration loss
graph (train.py:195-299): generator update (6 G forwards + 4 D forwards,
LSGAN-on-sigmoid targets, cycle L1 x10, identity L1 x5 with scheduled
cutoff, two-step adversarial terms) followed by the discriminator update
computed with the *updated* generator params (matching reference
ordering). Unlike the reference, generator outputs feeding the D step
are stop-gradient'd (its non-detached D step wastes compute without
changing final weights — SURVEY Appendix A.2; we implement the
equivalent-but-efficient form).

On TPU the whole step is a single XLA computation: all conv FLOPs batch
onto the MXU, the state is donated, and under a mesh the batch comes in
shard-annotated so gradients all-reduce over ICI (see parallel/).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from maskcyclegan_vc_tpu.train.schedules import identity_lambda
from maskcyclegan_vc_tpu.train.state import TrainConfig, TrainState, build_models, make_optimizers


def _lsgan(pred, target: float):
    return jnp.mean(jnp.square(target - pred.astype(jnp.float32)))


def _l1(a, b):
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def make_loss_fns(cfg: TrainConfig, with_identity: bool = True):
    """Build the G/D loss closures used by :func:`make_train_step`.

    Returns ``(gen, disc, g_loss_fn, d_loss_fn)``. Exposed separately so
    parity tests can take ``jax.grad`` of the exact production loss graph
    (tests/test_dynamics_parity.py pins per-leaf gradients against the
    torch reference at step 0).
    """
    gen, disc = build_models(cfg)
    sched = cfg.schedule
    pair = cfg.pair_forwards_resolved()

    gen_apply = gen.apply
    if cfg.remat:
        # Trade FLOPs for backward-residual HBM traffic: recompute each
        # generator forward during the backward pass.
        gen_apply = jax.checkpoint(lambda p, x, m: gen.apply(p, x, m))

    def g_loss_fn(g_params, d_params, batch, lam_id):
        real_A, mask_A = batch["real_A"], batch["mask_A"]
        real_B, mask_B = batch["real_B"], batch["mask_B"]
        B = real_A.shape[0]
        ones = jnp.ones_like(real_A)

        # reference train.py:203-216. With ``pair`` on, same-params
        # forwards are BATCHED (fake_B + identity_B both run A2B;
        # fake_A + identity_A + cycle_A run B2A): per-sample numerics
        # are the 1-at-a-time graph at f32 accumulation tolerance (conv
        # contractions and InstanceNorm stats are per-sample), but the
        # device sees half the launches at 2-3x the rows — the
        # launch-bound batch-1 scan config runs its convs at ~18% MXU
        # where every row helps (18.98 -> 13.87 ms/it, round-4 profile).
        if pair and with_identity:
            out_ab = gen_apply(g_params["A2B"],
                               jnp.concatenate([real_A, real_B]),
                               jnp.concatenate([mask_A, ones]))
            fake_B, identity_B = out_ab[:B], out_ab[B:]
            out_ba = gen_apply(g_params["B2A"],
                               jnp.concatenate([real_B, real_A, fake_B]),
                               jnp.concatenate([mask_B, ones, ones]))
            fake_A, identity_A, cycle_A = (out_ba[:B], out_ba[B:2 * B],
                                           out_ba[2 * B:])
        elif pair:
            fake_B = gen_apply(g_params["A2B"], real_A, mask_A)
            out_ba = gen_apply(g_params["B2A"],
                               jnp.concatenate([real_B, fake_B]),
                               jnp.concatenate([mask_B, ones]))
            fake_A, cycle_A = out_ba[:B], out_ba[B:]
        else:
            fake_B = gen_apply(g_params["A2B"], real_A, mask_A)
            fake_A = gen_apply(g_params["B2A"], real_B, mask_B)
            cycle_A = gen_apply(g_params["B2A"], fake_B, ones)
            if with_identity:
                identity_A = gen_apply(g_params["B2A"], real_A, ones)
                identity_B = gen_apply(g_params["A2B"], real_B, ones)
        cycle_B = gen_apply(g_params["A2B"], fake_A, ones)

        d_fake_A = disc.apply(d_params["A"], fake_A)
        d_fake_B = disc.apply(d_params["B"], fake_B)
        d_fake_cycle_A = disc.apply(d_params["A2"], cycle_A)
        d_fake_cycle_B = disc.apply(d_params["B2"], cycle_B)

        cycle_loss = _l1(real_A, cycle_A) + _l1(real_B, cycle_B)

        # reference train.py:207-210 (the reference keeps computing the
        # identity forwards after stop_identity_after — pure waste; here
        # the no-identity executable drops them).
        if with_identity:
            identity_loss = _l1(real_A, identity_A) + _l1(real_B, identity_B)
            # Report 0 past the cutoff (the term is weighted away there),
            # matching the no-identity executable's metric.
            identity_loss = jnp.where(lam_id > 0.0, identity_loss, 0.0)
        else:
            identity_loss = jnp.float32(0.0)

        adv = (
            _lsgan(d_fake_B, 1.0)
            + _lsgan(d_fake_A, 1.0)
            + _lsgan(d_fake_cycle_B, 1.0)
            + _lsgan(d_fake_cycle_A, 1.0)
        )
        total = (
            adv
            + sched.cycle_loss_lambda * cycle_loss
            + lam_id * identity_loss
        )
        aux = {
            "g_adv_loss": adv,
            "g_cycle_loss": cycle_loss,
            "g_identity_loss": identity_loss,
        }
        return total, aux

    def d_loss_fn(d_params, fakes, batch):
        real_A, real_B = batch["real_A"], batch["real_B"]
        B = real_A.shape[0]
        # reference train.py:255-294; with ``pair`` on, each
        # discriminator's real and fake applications batch into one
        # forward (same params -> same per-sample numerics, half the
        # launches; see g_loss_fn note).
        if pair:
            out_A = disc.apply(d_params["A"],
                               jnp.concatenate([real_A, fakes["generated_A"]]))
            out_B = disc.apply(d_params["B"],
                               jnp.concatenate([real_B, fakes["generated_B"]]))
            out_A2 = disc.apply(d_params["A2"],
                                jnp.concatenate([real_A, fakes["cycled_A"]]))
            out_B2 = disc.apply(d_params["B2"],
                                jnp.concatenate([real_B, fakes["cycled_B"]]))
            d_real_A, d_fake_A = out_A[:B], out_A[B:]
            d_real_B, d_fake_B = out_B[:B], out_B[B:]
            d_real_A2, d_cycled_A = out_A2[:B], out_A2[B:]
            d_real_B2, d_cycled_B = out_B2[:B], out_B2[B:]
        else:
            d_real_A = disc.apply(d_params["A"], real_A)
            d_real_B = disc.apply(d_params["B"], real_B)
            d_real_A2 = disc.apply(d_params["A2"], real_A)
            d_real_B2 = disc.apply(d_params["B2"], real_B)
            d_fake_A = disc.apply(d_params["A"], fakes["generated_A"])
            d_fake_B = disc.apply(d_params["B"], fakes["generated_B"])
            d_cycled_A = disc.apply(d_params["A2"], fakes["cycled_A"])
            d_cycled_B = disc.apply(d_params["B2"], fakes["cycled_B"])

        d_loss_A = (_lsgan(d_real_A, 1.0) + _lsgan(d_fake_A, 0.0)) / 2.0
        d_loss_B = (_lsgan(d_real_B, 1.0) + _lsgan(d_fake_B, 0.0)) / 2.0
        d_loss_A2 = (_lsgan(d_real_A2, 1.0) + _lsgan(d_cycled_A, 0.0)) / 2.0
        d_loss_B2 = (_lsgan(d_real_B2, 1.0) + _lsgan(d_cycled_B, 0.0)) / 2.0
        total = (d_loss_A + d_loss_B) / 2.0 + (d_loss_A2 + d_loss_B2) / 2.0
        return total, {"d_loss_first": d_loss_A + d_loss_B,
                       "d_loss_second": d_loss_A2 + d_loss_B2}

    return gen, disc, g_loss_fn, d_loss_fn


def make_train_step(cfg: TrainConfig, with_identity: bool = True,
                    with_eval_fake: bool = False,
                    grad_sync=None, metric_sync=None):
    """Build ``train_step(state, batch) -> (state, metrics)`` (pure, jittable).

    batch: {"real_A": (B,M,T), "mask_A": (B,M,T), "real_B": ..., "mask_B": ...}

    ``grad_sync`` / ``metric_sync`` are hooks for explicit-collective data
    parallelism (parallel/mesh.make_shardmap_train_step): ``grad_sync``
    is applied to the raw generator and discriminator grad trees right
    after ``value_and_grad`` — under ``shard_map`` it psums the
    per-device local-batch-mean grads into the global-batch-mean grad,
    optionally casting to a compressed wire dtype first — and
    ``metric_sync`` to the scalar metrics (a pmean, so every host
    reports global means). Under GSPMD (the default sharded path) both
    stay ``None``: XLA inserts the equivalent reductions itself.

    ``with_eval_fake`` adds the A->B conversion of ``real_A`` under the
    UPDATED generator to metrics as ``fake_B_eval``. The D step computes
    this tensor anyway (reference ordering), so in-loop vocoder decode
    (BASELINE config 5) can consume it from the same executable for free
    instead of re-dispatching a generator forward — XLA does not CSE the
    recomputation across the Pallas custom calls (measured ~8 ms extra).

    ``with_identity`` statically includes/excludes the identity-loss
    forwards. The identity cutoff is a fixed step threshold, so the
    trainer compiles both variants and switches executables at the
    boundary instead of carrying a ``lax.cond`` — a conditional is a
    scheduling barrier XLA can't fuse or overlap across (measured ~64
    ms/step wrapped in conds at BASELINE config 2), and after
    ``stop_identity_after`` (~98% of the canonical 500k-step run) the
    identity FLOPs vanish from the executable entirely. The
    ``with_identity=True`` variant stays correct past the cutoff too
    (terms are weighted by the scheduled lambda); the switch changes the
    trajectory only at f32 accumulation tolerance (the two executables
    batch the same-params generator forwards differently, so XLA may
    tile their contractions differently — pinned by
    tests/test_train_step.py::test_identity_executable_switch_is_exact).
    """
    gen, disc, g_loss_fn, d_loss_fn = make_loss_fns(cfg, with_identity)
    sched = cfg.schedule
    pair = cfg.pair_forwards_resolved()
    g_tx, d_tx = make_optimizers(cfg)

    def train_step(state: TrainState, batch: Dict[str, Any]):
        lam_id = identity_lambda(sched, state.step)

        # ---- Generator update ----
        (g_loss, g_aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params, state.d_params, batch, lam_id
        )
        if grad_sync is not None:
            g_grads = grad_sync(g_grads)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = jax.tree.map(lambda p, u: p + u, state.g_params, g_updates)

        # ---- Discriminator update (with updated G, reference ordering) ----
        real_A, mask_A = batch["real_A"], batch["mask_A"]
        real_B, mask_B = batch["real_B"], batch["mask_B"]
        Bn = real_A.shape[0]
        ones = jnp.ones_like(real_A)
        if pair:
            # Same-params batching again: generated_B and cycled_B both
            # run A2B and generated_B does not depend on generated_A, so
            # the four reference forwards (train.py:259-273) run as
            # three launches.
            generated_A = gen.apply(g_params["B2A"], real_B, mask_B)
            out_ab = gen.apply(g_params["A2B"],
                               jnp.concatenate([real_A, generated_A]),
                               jnp.concatenate([mask_A, ones]))
            generated_B, cycled_B = out_ab[:Bn], out_ab[Bn:]
            cycled_A = gen.apply(g_params["B2A"], generated_B, ones)
        else:
            generated_A = gen.apply(g_params["B2A"], real_B, mask_B)
            cycled_B = gen.apply(g_params["A2B"], generated_A, ones)
            generated_B = gen.apply(g_params["A2B"], real_A, mask_A)
            cycled_A = gen.apply(g_params["B2A"], generated_B, ones)
        fakes = jax.lax.stop_gradient({
            "generated_A": generated_A,
            "generated_B": generated_B,
            "cycled_A": cycled_A,
            "cycled_B": cycled_B,
        })

        (d_loss, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, fakes, batch
        )
        if grad_sync is not None:
            d_grads = grad_sync(d_grads)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = jax.tree.map(lambda p, u: p + u, state.d_params, d_updates)

        metrics = {
            "g_loss": g_loss,
            "d_loss": d_loss,
            "identity_lambda": lam_id,
            **g_aux,
            **d_aux,
        }
        if metric_sync is not None:
            metrics = metric_sync(metrics)
        if with_eval_fake:
            # Per-sample tensor — stays device-local, never synced.
            metrics["fake_B_eval"] = generated_B
        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt=g_opt,
            d_opt=d_opt,
        )
        return new_state, metrics

    return train_step


def make_jit_train_step(cfg: TrainConfig, with_identity: bool = True):
    """Single-device jitted step with state donation."""
    return jax.jit(make_train_step(cfg, with_identity), donate_argnums=(0,))


def make_scan_epoch(cfg: TrainConfig, with_identity: bool, n_steps: int,
                    batch: int, n_frames: int, max_mask_len: int):
    """One whole epoch as a single device program (lax.scan over steps).

    At the reference's canonical batch-1 config the per-step wall time is
    dominated by host dispatch (one jit launch + one sampler launch per
    81-step epoch through the TPU tunnel); scanning runs the epoch with
    ONE launch and returns per-step metrics stacked (n_steps,).

    Exactness: the per-step sampler key is ``fold_in(base_key,
    state.step)`` — the same derivation the step-at-a-time loop uses —
    so the batch stream is identical and the trajectory matches the
    unscanned path (pinned by tests/test_train_step.py).

    Returns ``epoch_fn(state, bank_a, bank_b, base_key) -> (state,
    stacked_metrics)``, jitted with state donation.
    """
    from maskcyclegan_vc_tpu.data.dataset import sample_batch

    # The pair-forwards heuristic resolves off cfg.schedule.batch_size;
    # the scan samples `batch` rows. They must agree or the heuristic
    # would be decided on a batch size different from the one run.
    assert batch == cfg.schedule.batch_size, (
        f"scan batch {batch} != cfg.schedule.batch_size "
        f"{cfg.schedule.batch_size}")
    step_fn = make_train_step(cfg, with_identity)

    def epoch_fn(state: TrainState, bank_a, bank_b, base_key):
        def body(st, _):
            key = jax.random.fold_in(base_key, st.step)
            b = sample_batch(key, bank_a, bank_b, batch, n_frames, max_mask_len)
            return step_fn(st, b)

        return jax.lax.scan(body, state, None, length=n_steps)

    return jax.jit(epoch_fn, donate_argnums=(0,))
