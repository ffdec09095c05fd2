"""Multi-host initialization (SURVEY §5.8 build requirement).

One process per host, all chips per process — the standard JAX TPU pod
pattern. ``initialize()`` wires ``jax.distributed`` from environment
variables (TPU pods auto-discover; explicit coordinator supported for
GPU/CPU fleets), after which ``jax.devices()`` spans the pod and the
``parallel.mesh`` code paths work unchanged: the mesh covers all global
devices, per-host data loading uses ``process_index``, and host-0 guards
in obs/io keep side effects single-writer.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed if running multi-host; no-op otherwise.

    On TPU pods all arguments are auto-discovered; elsewhere pass them or
    set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # Single-host (or TPU pod with full auto-discovery).
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process run
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_batch_slice(global_batch: int) -> slice:
    """This host's contiguous slice of a globally-indexed batch."""
    per = global_batch // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
