"""Multi-host initialization (SURVEY §5.8 build requirement).

One process per host, all chips per process — the standard JAX TPU pod
pattern. ``initialize()`` wires ``jax.distributed`` from environment
variables (TPU pods auto-discover; explicit coordinator supported for
GPU/CPU fleets), after which ``jax.devices()`` spans the pod and the
``parallel.mesh`` code paths work unchanged: the mesh covers all global
devices, per-host data loading uses ``process_index``, and host-0 guards
in obs/io keep side effects single-writer.

Failure policy: a misconfigured pod must ERROR, never silently fall back
to N independent single-process trainers each computing 1/N of the batch.
Only the one known "no cluster environment detected" case is treated as
a legitimate single-process run; any partially-specified configuration
(e.g. ``JAX_NUM_PROCESSES`` set without a coordinator address) raises.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               require_multiprocess: Optional[bool] = None) -> None:
    """Initialize jax.distributed; loud on success, loud on misconfiguration.

    On TPU pods all arguments are auto-discovered; elsewhere pass them or
    set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.

    ``require_multiprocess`` (or env ``MASKVC_REQUIRE_MULTIHOST=1``, set
    by scripts/train_pod.sh) additionally asserts the resolved world has
    >1 process — the guard against a pod launch that quietly came up as
    N solo trainers.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if require_multiprocess is None:
        require_multiprocess = os.environ.get(
            "MASKVC_REQUIRE_MULTIHOST", "0") not in ("0", "", "false")

    if (coordinator_address, num_processes, process_id) == (None, None, None):
        # Fully-auto path: TPU pods / managed clusters auto-discover. A
        # plain single-process run raises "coordinator_address should be
        # defined" — the ONLY failure class treated as single-process;
        # anything else propagates. Matched on the current ValueError
        # (jax 0.9.0 src/distributed.py) plus a future RuntimeError
        # rewrap of the same no-cluster-detected condition, but ONLY for
        # phrasings that assert the ABSENCE of a cluster — a bootstrap
        # failure that merely mentions "cluster environment" (e.g. a
        # metadata-server error on a real pod) must still fail loudly,
        # not fan out as N silent solo trainers.
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError) as e:
            msg = str(e).lower()
            no_cluster = ("coordinator_address" in msg
                          or "no cluster environment" in msg
                          or "could not find a cluster" in msg)
            if not no_cluster:
                raise
            if require_multiprocess:
                raise RuntimeError(
                    "multi-host run required (MASKVC_REQUIRE_MULTIHOST) but "
                    "no cluster environment was detected") from e
            print("[dist] no cluster environment detected — single-process run",
                  flush=True)
            return
    else:
        # Partially or fully explicit: every field must resolve; a typo'd
        # environment (JAX_NUM_PROCESSES without a coordinator) errors here
        # instead of training solo.
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )

    print(f"[dist] jax.distributed initialized: process "
          f"{jax.process_index()}/{jax.process_count()}, "
          f"{len(jax.local_devices())} local of {len(jax.devices())} devices",
          flush=True)
    if require_multiprocess and jax.process_count() < 2:
        raise RuntimeError(
            f"multi-host run required (MASKVC_REQUIRE_MULTIHOST) but "
            f"jax.process_count() == {jax.process_count()}")


def local_batch_slice(global_batch: int) -> slice:
    """This host's contiguous slice of a globally-indexed batch."""
    per = global_batch // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
