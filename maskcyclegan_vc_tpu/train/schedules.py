"""Learning-rate and loss-weight schedules as pure functions of the step.

The reference mutates learning rates imperatively per iteration
(train.py:139-155,306-315) keyed off a ``global_step`` that counts
*samples* (it increments by batch_size — train_logger.py:170-173).
Here every schedule is a pure function of the optimizer step count so
checkpoints resume exactly (SURVEY §3.5 notes the reference loses its
decay progress on resume; we don't reproduce that).

Derivation of the sample->step conversion: after iteration j (0-based),
global_step = (j+1)*batch. The reference decays when global_step >
decay_after, i.e. for all j >= floor(decay_after/batch); iteration i
therefore runs with n(i) = max(0, i - floor(decay_after/batch)) decays
applied. Identity loss is zeroed from the iteration after global_step
first exceeds stop_identity_after: lambda(i) = 0 iff
i > floor(stop_identity_after/batch).

``ref_compat`` reproduces reference Appendix-A bug 1 (train.py:307-311):
after decay starts, the generator optimizer's lr is overwritten by the
*discriminator's* decaying schedule and the discriminator optimizer is
never decayed at all.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    generator_lr: float = 2e-4
    discriminator_lr: float = 1e-4
    decay_after: int = 200_000  # in samples (reference semantics)
    stop_identity_after: int = 10_000  # in samples
    num_epochs: int = 6172
    n_samples: int = 81
    batch_size: int = 1
    identity_loss_lambda: float = 5.0
    cycle_loss_lambda: float = 10.0
    ref_compat_lr: bool = False

    @property
    def steps_per_epoch(self) -> int:
        return max(1, self.n_samples // self.batch_size)

    @property
    def total_steps(self) -> int:
        return self.num_epochs * self.steps_per_epoch

    @property
    def generator_lr_decay(self) -> float:
        # reference train.py:69-72
        return self.generator_lr / float(self.total_steps)

    @property
    def discriminator_lr_decay(self) -> float:
        return self.discriminator_lr / float(self.total_steps)


def _n_decays(cfg: ScheduleConfig, step):
    return jnp.maximum(0, step - cfg.decay_after // cfg.batch_size)


def generator_lr(cfg: ScheduleConfig, step):
    n = _n_decays(cfg, step).astype(jnp.float32)
    if cfg.ref_compat_lr:
        # Bug-compatible: G runs at its own lr until decay starts, then at
        # the discriminator's decaying schedule (reference train.py:307-311).
        decayed = jnp.maximum(0.0, cfg.discriminator_lr - cfg.discriminator_lr_decay * n)
        return jnp.where(n > 0, decayed, cfg.generator_lr)
    return jnp.maximum(0.0, cfg.generator_lr - cfg.generator_lr_decay * n)


def discriminator_lr(cfg: ScheduleConfig, step):
    if cfg.ref_compat_lr:
        # Bug-compatible: D is never decayed.
        return jnp.full((), cfg.discriminator_lr, jnp.float32)
    n = _n_decays(cfg, step).astype(jnp.float32)
    return jnp.maximum(0.0, cfg.discriminator_lr - cfg.discriminator_lr_decay * n)


def identity_lambda(cfg: ScheduleConfig, step):
    off = step > cfg.stop_identity_after // cfg.batch_size
    return jnp.where(off, 0.0, cfg.identity_loss_lambda).astype(jnp.float32)
