"""Device mesh + sharded training step (jax.sharding / GSPMD).

The reference is single-process single-GPU (SURVEY §2.6); this layer is
the from-scratch TPU-native scaling design:

  * one ``Mesh`` over all chips with a ``data`` axis;
  * parameters + optimizer state replicated, utterance batches sharded
    over ``data``;
  * the fused two-sided train step jitted with those shardings — XLA
    GSPMD partitions the graph and inserts the gradient all-reduces
    (the ``jax.lax.pmean`` of hand-written pmap code) over ICI/DCN;
  * the per-sample sampler key is folded per-device inside jit, so the
    global batch is seed-stable for any device count.

At 24M params and this batch regime, data parallelism is the only
sharding with signal (SURVEY §2.6 documents TP/PP/SP/EP as N/A); the
mesh still carries a ``model`` axis of size 1 so model-parallel
shardings can be introduced without re-plumbing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from maskcyclegan_vc_tpu.train.state import TrainConfig
from maskcyclegan_vc_tpu.train.step import make_train_step


def make_sharded_scan_epoch(cfg: TrainConfig, mesh: Mesh, with_identity: bool,
                            n_steps: int, batch: int, n_frames: int,
                            max_mask_len: int):
    """Whole-epoch lax.scan under GSPMD: on-device sampling, sharded steps.

    The single-device rationale (train/step.make_scan_epoch: one device
    program per epoch, no per-step host dispatch) carried onto the mesh:
    the sampled batch gets a ``P('data')`` sharding constraint inside the
    loop, so every train step runs with the same partitioning as the
    step-at-a-time path and XLA inserts the same gradient all-reduces.
    Runs multi-process too (round 4): banks are replicated (every host
    loads the same preprocessed files) and sampling is a pure function
    of fold_in(base_key, step), so all processes execute the same scan
    program over their addressable shards — pinned against the
    single-process trajectory by tests/test_multiprocess.py.
    """
    from maskcyclegan_vc_tpu.data.dataset import sample_batch

    # Keep the pair-forwards heuristic (resolved off cfg.schedule.
    # batch_size) decided on the batch size actually scanned.
    assert batch == cfg.schedule.batch_size, (
        f"scan batch {batch} != cfg.schedule.batch_size "
        f"{cfg.schedule.batch_size}")
    step_fn = make_train_step(cfg, with_identity)
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)

    def epoch_fn(state, bank_a, bank_b, base_key):
        def body(st, _):
            key = jax.random.fold_in(base_key, st.step)
            b = sample_batch(key, bank_a, bank_b, batch, n_frames, max_mask_len)
            b = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, bsh), b)
            return step_fn(st, b)

        return jax.lax.scan(body, state, None, length=n_steps)

    return jax.jit(
        epoch_fn,
        in_shardings=(repl, repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_mesh(devices: Optional[Sequence] = None, data_axis: Optional[int] = None) -> Mesh:
    """Mesh over devices: ('data', 'model') with model=1 by default."""
    if devices is None:
        devices = jax.devices()
    n = len(devices) if data_axis is None else data_axis
    dev_array = np.asarray(devices[:n]).reshape(n, 1)
    return Mesh(dev_array, axis_names=("data", "model"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh.

    Works single- and multi-process: with >1 process every host passes
    its (identical) full value and the runtime assembles the global
    replicated array without any cross-host transfer.
    """
    s = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, s)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            s, np.asarray(x), np.shape(x)),
        tree,
    )


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with its leading dim sharded over ``data``.

    Multi-process contract (SURVEY §7.3.6 determinism requirement): every
    host samples the SAME seed-stable global batch (sampling is a pure
    function of the folded step key), then contributes only the rows its
    addressable devices own — ``jax.devices()`` orders devices by process,
    so process ``i``'s rows are the ``i``-th contiguous block.
    """
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, s)
    n, i = jax.process_count(), jax.process_index()

    def put(x):
        x = np.asarray(x)
        per = x.shape[0] // n
        return jax.make_array_from_process_local_data(
            s, x[i * per:(i + 1) * per], x.shape)

    return jax.tree.map(put, batch)


def _explicit_sync_fns(mesh: Mesh, allreduce_dtype=None):
    """grad/metric sync hooks for the explicit-collective (shard_map) DP
    path: psum per-device grads (optionally over a compressed wire dtype)
    and pmean scalar metrics, both over the ``data`` axis."""
    import jax.numpy as jnp

    axis = "data"
    ndev = mesh.shape[axis]
    wire = jnp.dtype(allreduce_dtype) if allreduce_dtype is not None else None

    def grad_sync(grads):
        def red(g):
            out_dtype = g.dtype
            if wire is not None and g.dtype != wire:
                g = g.astype(wire)
            g = jax.lax.psum(g, axis)
            return g.astype(out_dtype) / ndev
        return jax.tree.map(red, grads)

    def metric_sync(metrics):
        return jax.tree.map(lambda v: jax.lax.pmean(v, axis), metrics)

    return grad_sync, metric_sync


def make_shardmap_train_step(cfg: TrainConfig, mesh: Mesh,
                             with_identity: bool = True,
                             allreduce_dtype=None, donate: bool = True):
    """Explicit-collective data-parallel step (shard_map + psum).

    The GSPMD path (:func:`make_sharded_train_step`) lets XLA place the
    gradient all-reduces, always at the grads' dtype (f32). Within a v5e
    slice that is the right default — the ICI roofline puts the 591 MB
    ring all-reduce at ~5.9 ms against a 255 ms step (~97% predicted
    efficiency, COVERAGE.md). ACROSS slices the same bytes ride DCN at
    ~10x worse effective bandwidth and predict ~81%, under the >=85%
    BASELINE bar. This variant writes the reduction by hand so its wire
    format is controllable: per-device local-batch-mean grads are cast
    to ``allreduce_dtype`` (bf16 halves the bytes -> ~90% predicted at
    DCN rates), psum'd over the ``data`` axis, averaged back in the
    param dtype, and fed to the identical optimizer update replicated on
    every device — params never diverge across devices because every
    device applies the same synced update.

    Numerics: with ``allreduce_dtype=None`` this is the hand-written
    equivalent of the GSPMD step (pinned against it by
    tests/test_sharding.py::test_shardmap_step_matches_gspmd); bf16
    compression rounds the summed gradient to ~3 significant digits, a
    bounded trajectory perturbation of the same character as any
    reduction-order change (Adam is gradient-scale invariant, so each
    update stays lr-bounded per coordinate).
    """
    from maskcyclegan_vc_tpu.train.step import make_train_step as _mts

    grad_sync, metric_sync = _explicit_sync_fns(mesh, allreduce_dtype)
    step_fn = _mts(cfg, with_identity, grad_sync=grad_sync,
                   metric_sync=metric_sync)
    mapped = jax.shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P("data")), out_specs=(P(), P()))
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    batch_shardings = {k: bsh for k in ("real_A", "mask_A", "real_B", "mask_B")}
    return jax.jit(
        mapped,
        in_shardings=(repl, batch_shardings),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_shardmap_scan_epoch(cfg: TrainConfig, mesh: Mesh, with_identity: bool,
                             n_steps: int, batch: int, n_frames: int,
                             max_mask_len: int, allreduce_dtype=None):
    """Whole-epoch scan on the explicit-collective DP path.

    Mirrors :func:`make_sharded_scan_epoch` (the trainer's default
    sharded execution) for runs that need a controlled gradient wire
    dtype. Sampling stays seed-identical to every other path: each
    device computes the same global batch from ``fold_in(base_key,
    step)`` (replicated compute, trivially cheap next to the step) and
    slices out the rows its mesh position owns — the same contiguous
    blocks ``shard_batch`` distributes.
    """
    from maskcyclegan_vc_tpu.data.dataset import sample_batch
    from maskcyclegan_vc_tpu.train.step import make_train_step as _mts

    assert batch == cfg.schedule.batch_size, (
        f"scan batch {batch} != cfg.schedule.batch_size "
        f"{cfg.schedule.batch_size}")
    axis = "data"
    ndev = mesh.shape[axis]
    assert batch % ndev == 0, (batch, ndev)
    per = batch // ndev

    grad_sync, metric_sync = _explicit_sync_fns(mesh, allreduce_dtype)
    step_fn = _mts(cfg, with_identity, grad_sync=grad_sync,
                   metric_sync=metric_sync)

    def epoch_local(state, bank_a, bank_b, base_key):
        i = jax.lax.axis_index(axis)

        def body(st, _):
            key = jax.random.fold_in(base_key, st.step)
            b = sample_batch(key, bank_a, bank_b, batch, n_frames,
                             max_mask_len)
            b = jax.tree.map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, i * per, per, 0), b)
            return step_fn(st, b)

        return jax.lax.scan(body, state, None, length=n_steps)

    mapped = jax.shard_map(
        epoch_local, mesh=mesh,
        in_specs=(P(), P(), P(), P()), out_specs=(P(), P()))
    repl = replicated_sharding(mesh)
    return jax.jit(
        mapped,
        in_shardings=(repl, repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_sharded_train_step(cfg: TrainConfig, mesh: Mesh, donate: bool = True,
                            with_identity: bool = True):
    """Jitted train step with GSPMD shardings over ``mesh``.

    State is replicated; batch arrives sharded on its leading dim. XLA
    inserts the cross-device grad reduction because every loss term is a
    global mean over the sharded batch dim.
    """
    step_fn = make_train_step(cfg, with_identity)
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    batch_shardings = {k: bsh for k in ("real_A", "mask_A", "real_B", "mask_B")}
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_shardings),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
