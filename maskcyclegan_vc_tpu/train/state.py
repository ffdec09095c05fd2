"""Training state: a single pytree holding all params + optimizer state.

The reference keeps 6 torch modules and 2 Adam optimizers as Python
objects (train.py:103-122); here everything is one immutable pytree so
the whole two-sided update jits, shards, donates, and checkpoints
atomically (SURVEY §5.4 build note).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from maskcyclegan_vc_tpu.models import Discriminator, Generator
from maskcyclegan_vc_tpu.train.schedules import (
    ScheduleConfig,
    discriminator_lr,
    generator_lr,
)
from maskcyclegan_vc_tpu.utils.init import fast_init


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static configuration for model + optimizer construction."""

    schedule: ScheduleConfig = dataclasses.field(default_factory=ScheduleConfig)
    n_mels: int = 80
    num_frames: int = 64
    residual_channels: int = 256
    adam_b1: float = 0.5  # reference train.py:119-122
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    include_dead_params: bool = True
    dtype: Any = None  # compute dtype, e.g. jnp.bfloat16 for TPU perf
    precision: Optional[str] = None  # conv precision ("highest" for parity)
    fused_norms: bool = False  # Pallas fused IN(+gate) epilogues
    remat: bool = False  # rematerialize generator forwards in the G step
    # Batch same-params forwards (fake+identity+cycle rows through one
    # generator launch; each D's real+fake pair through one launch).
    # None = auto: on below 16 samples, where the step is launch-bound
    # (batch-1 scan: 18.98 -> 13.87 ms/it); off at large batch, where
    # the extra concat/slice traffic costs ~2.5% (measured at batch 32).
    pair_forwards: Optional[bool] = None
    # Residual-stack k3 convs as shifted matmuls (perf A/B, see
    # models/generator.ResidualBlock.k3_matmul).
    k3_matmul: bool = False
    # Split the generator's paired downsample convs into separate convs
    # (perf A/B, see ops/layers.GatedConv2d.split_pair).
    split_gated_conv: bool = False

    def pair_forwards_resolved(self) -> bool:
        if self.pair_forwards is None:
            return self.schedule.batch_size < 16
        return self.pair_forwards


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any  # {"A2B": ..., "B2A": ...}
    d_params: Any  # {"A": ..., "B": ..., "A2": ..., "B2": ...}
    g_opt: Any
    d_opt: Any


def _dead_param_mask(params):
    """True for trainable leaves, False for checkpoint-compat dead params."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_dead(path):
        return any("downSample4" in str(getattr(k, "key", k)) for k in path)

    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [not is_dead(path) for path, _ in flat],
    )


def make_optimizers(cfg: TrainConfig):
    """Two Adams with schedule-driven lrs (reference train.py:119-122).

    The discriminator optimizer masks out the dead ``downSample4`` params:
    their grads are identically zero so Adam would no-op on them anyway
    (m, v stay 0); masking only avoids carrying useless moment buffers.
    The mask is passed as a *callable* so the transforms are structure-
    independent — no concrete param tree is needed to construct them.
    """
    sched = cfg.schedule

    def adam(lr_fn):
        return optax.chain(
            optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps),
            optax.scale_by_schedule(lambda count: -lr_fn(sched, count)),
        )

    g_tx = adam(generator_lr)
    d_tx = optax.masked(adam(discriminator_lr), _dead_param_mask)
    return g_tx, d_tx


def build_models(cfg: TrainConfig):
    gen = Generator(
        n_mels=cfg.n_mels,
        residual_channels=cfg.residual_channels,
        dtype=cfg.dtype,
        precision=cfg.precision,
        fused_norms=cfg.fused_norms,
        k3_matmul=cfg.k3_matmul,
        split_gated_conv=cfg.split_gated_conv,
    )
    disc = Discriminator(
        residual_channels=cfg.residual_channels,
        include_dead_params=cfg.include_dead_params,
        dtype=cfg.dtype,
        precision=cfg.precision,
        fused_norms=cfg.fused_norms,
    )
    return gen, disc


def create_train_state(cfg: TrainConfig, seed: int = 0) -> TrainState:
    """Initialize all 2 generators + 4 discriminators and both optimizers."""
    gen, disc = build_models(cfg)
    x = jnp.zeros((1, cfg.n_mels, cfg.num_frames))
    g_params = {
        "A2B": fast_init(gen, seed, x, jnp.ones_like(x)),
        "B2A": fast_init(gen, seed + 1, x, jnp.ones_like(x)),
    }
    d_params = {
        "A": fast_init(disc, seed + 2, x),
        "B": fast_init(disc, seed + 3, x),
        "A2": fast_init(disc, seed + 4, x),
        "B2": fast_init(disc, seed + 5, x),
    }
    g_tx, d_tx = make_optimizers(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
    )
