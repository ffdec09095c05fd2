"""Atomic pytree checkpointing.

One checkpoint = one ``.npz`` holding every leaf of the TrainState
(params of 2 G + 4 D, both optimizer states, step) plus optional
``meta/``-prefixed extras — the trainer stores the RNG seed and both
speakers' normalization stats there, making each file a self-contained
snapshot (resume re-derives the sampler key from seed+step; the stats
let conversion run without the preprocessed npz files). This is the
single-file atomic design SURVEY §5.4 prescribes (the reference splits
state across 6 torch files with duplicated optimizer state,
model_saver.py:66-79; resume only needs one coherent snapshot).

Atomicity: write to ``<path>.tmp`` then ``os.replace`` — a crashed run
can never leave a half-written checkpoint under the final name. Multi-
host: call only from host 0 (state is replicated).

Also provides ``import_reference_checkpoints``: builds a TrainState from
a directory of reference ``.pth.tar`` files (epoch-tagged, 6 per save),
for the matched-checkpoint parity pipeline.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, tree: Any,
                    meta: Optional[Dict[str, Any]] = None) -> None:
    """Atomically write a pytree to ``path`` (.npz).

    ``meta`` entries are stored under ``meta/<name>`` keys, outside the
    state tree — ``load_checkpoint`` ignores them; read them back with
    ``load_checkpoint_meta``.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(tree)
    for k, v in (meta or {}).items():
        flat[f"meta/{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


class AsyncSaver:
    """Overlap checkpoint FILE writes with training.

    The device->host fetch must stay synchronous in the caller (its
    arrays may be donated to the next step executable the moment
    training resumes), so ``save`` takes an already-host pytree
    (``jax.device_get`` it first) and runs only serialization + atomic
    rename on a worker thread. One write in flight at a time: a new
    ``save`` joins the previous one, and ``wait()`` flushes at
    shutdown — call it before reading the directory (resume scans,
    rotation already rides ``on_done``). Atomicity is unchanged
    (tmp + ``os.replace``), so a crash mid-write never leaves a partial
    file under the final name. A failed write re-raises on the next
    ``save``/``wait`` instead of being silently dropped.

    Why: each full-state snapshot is ~1 GB; at the reference's
    100-epoch save cadence a synchronous ``np.savez`` stalls the epoch
    loop for the whole file write — measured 2.3-3.4 s per full-size
    state (1.05 GB) on this host, i.e. ~8 canonical batch-1 epochs of
    training hidden per save once overlapped.
    """

    def __init__(self) -> None:
        self._thread = None
        self._exc: Optional[BaseException] = None

    def save(self, path: str, host_tree: Any,
             meta: Optional[Dict[str, Any]] = None,
             on_done=None) -> None:
        """Queue an atomic write of ``host_tree`` (host-resident leaves)."""
        self.wait()

        def _work():
            try:
                save_checkpoint(path, host_tree, meta)
                if on_done is not None:
                    on_done()
            except BaseException as e:  # re-raised on the next save/wait
                self._exc = e

        import threading

        self._thread = threading.Thread(
            target=_work, name="ckpt-writer", daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight write (if any) lands; re-raise its
        error."""
        t, self._thread = self._thread, None
        if t is not None:
            t.join()
        if self._exc is not None:
            e, self._exc = self._exc, None
            raise e


def load_checkpoint_meta(path: str) -> Dict[str, np.ndarray]:
    """Return the ``meta/`` extras stored alongside the state tree."""
    with np.load(path) as z:
        return {k[len("meta/"):]: z[k] for k in z.files if k.startswith("meta/")}


def load_checkpoint(path: str, like: Any) -> Any:
    """Load a pytree saved by ``save_checkpoint`` into the structure of
    ``like`` (shape/dtype-checked leaf by leaf)."""
    with np.load(path) as z:
        flat_like, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        for path_k, leaf in flat_like:
            key = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path_k
            )
            if key not in z:
                raise KeyError(f"checkpoint missing leaf {key}")
            arr = z[key]
            if tuple(arr.shape) != tuple(np.shape(leaf)):
                raise ValueError(
                    f"shape mismatch at {key}: ckpt {arr.shape} vs state {np.shape(leaf)}"
                )
            leaves.append(jnp.asarray(arr, dtype=jnp.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_checkpoint_subtree(path: str, prefix: str) -> Any:
    """Load only the leaves under ``prefix`` (e.g. ``"g_params/A2B"``) as
    a nested dict.

    Inference needs one generator (~98 MB of leaves), not the full
    TrainState (~1 GB with optimizer moments); this reads just the
    matching npz entries instead of materializing and device-placing the
    whole state — the conversion CLI and checkpoint-scoring loops use it
    (cli/test.py::load_generator_params).
    """
    out: Dict[str, Any] = {}
    with np.load(path) as z:
        for k in z.files:
            # Dataclass-field path entries stringify with a leading dot
            # (GetAttrKey: ".g_params/..."); accept the prefix without it.
            kn = k[1:] if k.startswith(".") else k
            if not kn.startswith(prefix + "/"):
                continue
            parts = kn[len(prefix) + 1:].split("/")
            d = out
            for s in parts[:-1]:
                d = d.setdefault(s, {})
            d[parts[-1]] = jnp.asarray(z[k])
    if not out:
        raise KeyError(f"no leaves under {prefix!r} in {path}")
    return out


# ---------------------------------------------------------------------------
# Epoch-tagged checkpoint directories
# ---------------------------------------------------------------------------

_CKPT_RE = re.compile(r"^(\d{5})_state\.npz$")


def checkpoint_path(ckpt_dir: str, epoch: int) -> str:
    return os.path.join(ckpt_dir, f"{epoch:05d}_state.npz")


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    """Largest epoch with a checkpoint (reference autodetect semantics,
    base_arg_parser.py:125-145)."""
    best = None
    for p in glob.glob(os.path.join(ckpt_dir, "*_state.npz")):
        m = _CKPT_RE.match(os.path.basename(p))
        if m:
            e = int(m.group(1))
            best = e if best is None else max(best, e)
    return best


def rotate_checkpoints(ckpt_dir: str, max_ckpts: int) -> None:
    """Keep only the newest ``max_ckpts`` checkpoints (the reference's
    --max_ckpts flag exists but is never wired up — Appendix A.12; here
    it works)."""
    if max_ckpts <= 0:
        return
    entries = []
    for p in glob.glob(os.path.join(ckpt_dir, "*_state.npz")):
        m = _CKPT_RE.match(os.path.basename(p))
        if m:
            entries.append((int(m.group(1)), p))
    entries.sort()
    for _, p in entries[:-max_ckpts]:
        os.remove(p)


# ---------------------------------------------------------------------------
# Reference .pth.tar ingestion
# ---------------------------------------------------------------------------

def import_reference_checkpoints(
    ckpt_dir: str, epoch: int, state: Any
) -> Tuple[Any, int]:
    """Load reference ``{epoch:05d}_<model>.pth.tar`` files into ``state``.

    Replaces the params of both generators and all four discriminators
    (including the dead downSample4 block) with the reference weights;
    optimizer state is left as-is (torch Adam moments have a different
    layout; resuming training *dynamics* mid-run from torch is out of
    parity scope — SURVEY §5.4 requires weight-level ingestion for the
    allclose check).
    """
    from maskcyclegan_vc_tpu.io.torch_import import (
        discriminator_params_from_torch,
        generator_params_from_torch,
        load_pth_tar,
    )

    def path_for(name):
        return os.path.join(ckpt_dir, f"{epoch:05d}_{name}.pth.tar")

    g_params = {}
    for ours, theirs in (("A2B", "generator_A2B"), ("B2A", "generator_B2A")):
        sd, _ = load_pth_tar(path_for(theirs))
        g_params[ours] = jax.tree.map(jnp.asarray, generator_params_from_torch(sd))
    d_params = {}
    for ours, theirs in (
        ("A", "discriminator_A"),
        ("B", "discriminator_B"),
        ("A2", "discriminator_A2"),
        ("B2", "discriminator_B2"),
    ):
        sd, _ = load_pth_tar(path_for(theirs))
        d_params[ours] = jax.tree.map(jnp.asarray, discriminator_params_from_torch(sd))
    return state.replace(g_params=g_params, d_params=d_params), epoch
