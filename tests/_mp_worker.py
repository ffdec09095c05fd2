"""Worker for the multi-process data-parallel test (run as a subprocess).

Each process owns 4 virtual CPU devices; together they form the same
8-device mesh the single-process tests use, so the two-process run must
reproduce the single-process numbers exactly. Exercises the real
multi-host code paths: jax.distributed.initialize, process-local
replicate(), and per-process shard_batch() slicing.

Usage: python _mp_worker.py <process_id> <num_processes> <port> <out.npz>
"""

import os
import sys

pid, nproc, port, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402

from maskcyclegan_vc_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    make_sharded_train_step,
    replicate,
    shard_batch,
)
from tests.test_sharding import tiny_batch, tiny_cfg  # noqa: E402

assert len(jax.devices()) == 4 * nproc, jax.devices()
assert len(jax.local_devices()) == 4

cfg = tiny_cfg()
mesh = make_mesh()
from maskcyclegan_vc_tpu.train.state import create_train_state  # noqa: E402

state = replicate(create_train_state(cfg, seed=0), mesh)
step = make_sharded_train_step(cfg, mesh, donate=False)

# AOT-compile before the first execution, then barrier: gloo's communicator
# bring-up has a ~30s key-value timeout, and without the barrier the two
# processes reach their first collective minutes apart (independent XLA
# compiles of the same module).
batches = [shard_batch(tiny_batch(i), mesh) for i in range(2)]
step_c = step.lower(state, batches[0]).compile()
from jax._src import distributed  # noqa: E402

distributed.global_state.client.wait_at_barrier(
    "mp_test_compile_done", timeout_in_ms=900_000)

losses = []
for b in batches:
    state, metrics = step_c(state, b)
    losses.append(float(metrics["g_loss"]))

# Checksum on the host: launching a jnp reduction here would be an SPMD
# collective over ALL processes, which would deadlock once the other
# process exits. Fully-replicated global arrays materialize locally.
leaves = jax.tree.leaves(state.g_params)
checksum = np.array([float(np.square(np.asarray(x)).sum()) for x in leaves])

# --- Sharded scan-epoch under multi-process (round-4 directive 6) ---
# Banks are replicated and on-device sampling is a pure function of the
# folded key, so every process runs the SAME scan program over its
# addressable shards; GSPMD inserts the gradient all-reduces exactly as
# in the step-at-a-time path.
from maskcyclegan_vc_tpu.data.dataset import MelBank  # noqa: E402
from maskcyclegan_vc_tpu.parallel.mesh import make_sharded_scan_epoch  # noqa: E402
from maskcyclegan_vc_tpu.train.state import create_train_state as _cts  # noqa: E402

rs = np.random.RandomState(7)
bank = MelBank.from_list(
    [rs.randn(8, 24).astype(np.float32) for _ in range(6)], min_frames=8)
scan_state = replicate(_cts(cfg, seed=3), mesh)
bank_r = replicate(bank, mesh)
epoch = make_sharded_scan_epoch(cfg, mesh, True, n_steps=3, batch=8,
                                n_frames=8, max_mask_len=4)
epoch_c = epoch.lower(scan_state, bank_r, bank_r, jax.random.PRNGKey(11)).compile()
distributed.global_state.client.wait_at_barrier(
    "mp_test_scan_compile_done", timeout_in_ms=900_000)
scan_state, stacked = epoch_c(scan_state, bank_r, bank_r, jax.random.PRNGKey(11))
scan_losses = np.asarray(stacked["g_loss"])
scan_checksum = np.array([
    float(np.square(np.asarray(x)).sum())
    for x in jax.tree.leaves(scan_state.g_params)])

# --- Explicit-collective (shard_map) step, bf16 wire (round-5) ---
# The hand-placed psum path must come up under a real 2-process mesh
# exactly like GSPMD: same replicated state assembly, same per-process
# batch slices, collectives spanning both processes.
from maskcyclegan_vc_tpu.parallel.mesh import make_shardmap_train_step  # noqa: E402

sm_state = replicate(_cts(cfg, seed=0), mesh)
sm_step = make_shardmap_train_step(
    cfg, mesh, allreduce_dtype="bfloat16", donate=False)
sm_c = sm_step.lower(sm_state, batches[0]).compile()
distributed.global_state.client.wait_at_barrier(
    "mp_test_shardmap_compile_done", timeout_in_ms=900_000)
sm_state, sm_metrics = sm_c(sm_state, batches[0])
sm_loss = float(sm_metrics["g_loss"])
sm_checksum = np.array([
    float(np.square(np.asarray(x)).sum())
    for x in jax.tree.leaves(sm_state.g_params)])

if pid == 0:
    np.savez(out_path, losses=np.array(losses), checksum=checksum,
             scan_losses=scan_losses, scan_checksum=scan_checksum,
             sm_loss=np.array(sm_loss), sm_checksum=sm_checksum)
