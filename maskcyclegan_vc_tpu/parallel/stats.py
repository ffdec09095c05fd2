"""Collective per-speaker normalization statistics.

The reference computes mean/std over all of a speaker's frames in one
single-process numpy pass (preprocess_vcc2018.py:39-41). At pod scale
each host holds a shard of the utterances; this computes the identical
global stats with ``psum`` collectives over the mesh (SURVEY §2.6
"collective normalization stats").

Math: with per-shard sums S1 = sum(x), S2 = sum(x^2), N = frame count,
    mean = psum(S1)/psum(N)
    std  = sqrt(psum(S2)/psum(N) - mean^2) + 1e-9   (biased, ref parity)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
shard_map = jax.shard_map


def collective_norm_stats(frames, frame_valid, mesh: Mesh):
    """Global mel mean/std over a device-sharded frame bank.

    Args:
      frames: (N, M, T) utterances, sharded over ``data`` on dim 0.
      frame_valid: (N, T) 1.0 where a frame is real (padding excluded),
        sharded like ``frames``.
      mesh: the device mesh.

    Returns:
      (mean, std): (M, 1) float32 replicated arrays, matching the
      reference's concatenated-frames stats with its +1e-9 epsilon.
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=(P(), P()),
    )
    def _stats(x, v):
        v3 = v[:, None, :]  # (n, 1, T)
        s1 = jnp.sum(x * v3, axis=(0, 2))          # (M,)
        s2 = jnp.sum(jnp.square(x) * v3, axis=(0, 2))
        n = jnp.sum(v)
        s1 = jax.lax.psum(s1, "data")
        s2 = jax.lax.psum(s2, "data")
        n = jax.lax.psum(n, "data")
        mean = s1 / n
        var = s2 / n - jnp.square(mean)
        std = jnp.sqrt(jnp.maximum(var, 0.0)) + 1e-9
        return mean[:, None], std[:, None]

    return _stats(frames.astype(jnp.float32), frame_valid.astype(jnp.float32))


def norm_stats_over_devices(mels, mesh: Mesh = None):
    """Collective drop-in for ``data.dataset.compute_norm_stats``.

    Pads a speaker's utterance list into a device-sharded (N, M, Tmax)
    frame bank (N padded to the device count) and computes the global
    mean/std with :func:`collective_norm_stats` — the production call
    site is ``cli/preprocess.py``, which selects this path whenever the
    runtime exposes more than one device (replacing the reference's
    single-process numpy pass, preprocess_vcc2018.py:39-41). On a
    multi-host pod each process contributes its local utterances; in a
    single process the bank shards over the local mesh, exercising the
    identical psum graph.

    Args:
      mels: list of (M, T_i) float arrays (one speaker's utterances).
      mesh: optional mesh; defaults to a fresh data mesh over all devices.

    Returns:
      (mean, std): (M, 1) float32 numpy arrays matching the reference's
      concatenated-frames statistics (+1e-9 epsilon).
    """
    import numpy as np

    if mesh is None:
        from maskcyclegan_vc_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    m = mels[0].shape[0]
    t_max = max(x.shape[1] for x in mels)
    n = -(-len(mels) // n_dev) * n_dev  # pad to a device multiple
    frames = np.zeros((n, m, t_max), np.float32)
    valid = np.zeros((n, t_max), np.float32)
    for i, x in enumerate(mels):
        frames[i, :, : x.shape[1]] = x
        valid[i, : x.shape[1]] = 1.0
    mean, std = collective_norm_stats(
        jnp.asarray(frames), jnp.asarray(valid), mesh)
    return np.asarray(mean), np.asarray(std)
