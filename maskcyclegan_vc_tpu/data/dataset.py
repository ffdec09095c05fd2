"""On-device dataset: padded mel bank + jittable crop/FIF-mask sampling.

The reference's ``VCDataset.__getitem__`` (dataset/vc_dataset.py:19-77)
reshuffles and crops the whole dataset per item on the host with global
numpy RNG — O(dataset) per sample and unseedable under workers (SURVEY
Appendix A.3). Here the full mel corpus (VCC2018 scale: ~81 utterances
x ~few hundred frames per speaker) lives on device as one padded array,
and a batch is sampled *inside jit* from a ``jax.random`` key:

    utterance ids  ~ U{0..N-1}          (iid per slot)
    crop start     ~ U{0..len-n_frames} (per utterance, via its length)
    mask_size      ~ U{0..max_mask_len-1}   (exclusive upper bound,
                                             vc_dataset.py:51 semantics)
    mask_start     ~ U{0..n_frames-mask_size-1}

Distributionally this matches the reference's per-epoch uniform pairing
(its shuffle makes every (A, B) pairing equally likely); determinism is
total given the key, independent of host count — each host folds its
process index into the key (SURVEY §7.3.6).
"""

from __future__ import annotations

import functools
import os
import pickle
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class MelBank(struct.PyTreeNode):
    """Padded utterance store: data (N, M, Tmax), lengths (N,)."""

    data: jnp.ndarray
    lengths: jnp.ndarray

    @staticmethod
    def from_list(mels: List[np.ndarray], min_frames: int = 64) -> "MelBank":
        """Build from a list of (M, T) arrays, dropping T < min_frames
        (reference preprocess_vcc2018.py:36 drops short utterances)."""
        kept = [m for m in mels if m.shape[1] >= min_frames]
        if not kept:
            raise ValueError("no utterances with enough frames")
        tmax = max(m.shape[1] for m in kept)
        n, mel_bins = len(kept), kept[0].shape[0]
        data = np.zeros((n, mel_bins, tmax), np.float32)
        lengths = np.zeros((n,), np.int32)
        for i, m in enumerate(kept):
            data[i, :, : m.shape[1]] = m
            lengths[i] = m.shape[1]
        return MelBank(jnp.asarray(data), jnp.asarray(lengths))

    def __len__(self):
        return self.data.shape[0]


def _sample_side(key, bank: MelBank, batch: int, n_frames: int, max_mask_len: int):
    k_utt, k_start, k_msize, k_mstart = jax.random.split(key, 4)
    n, m, tmax = bank.data.shape

    utt = jax.random.randint(k_utt, (batch,), 0, n)
    lens = bank.lengths[utt]
    # start ~ U{0..len-n_frames} (vc_dataset.py:49)
    u = jax.random.uniform(k_start, (batch,))
    start = (u * (lens - n_frames + 1).astype(jnp.float32)).astype(jnp.int32)

    def crop(one_utt, one_start):
        return jax.lax.dynamic_slice(
            bank.data[one_utt], (0, one_start), (m, n_frames)
        )

    frames = jax.vmap(crop)(utt, start)  # (B, M, n_frames)

    # FIF mask: size ~ U{0..max_mask_len-1}, start ~ U{0..n_frames-size-1}
    msize = jax.random.randint(k_msize, (batch,), 0, max_mask_len)
    u2 = jax.random.uniform(k_mstart, (batch,))
    mstart = (u2 * (n_frames - msize).astype(jnp.float32)).astype(jnp.int32)
    t = jnp.arange(n_frames)[None, :]
    hole = (t >= mstart[:, None]) & (t < (mstart + msize)[:, None])
    mask = jnp.where(hole, 0.0, 1.0)[:, None, :] * jnp.ones((1, m, 1))
    return frames, mask.astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def sample_batch(key, bank_a: MelBank, bank_b: MelBank, batch: int,
                 n_frames: int = 64, max_mask_len: int = 25):
    """Sample a paired training batch entirely on device."""
    ka, kb = jax.random.split(key)
    real_a, mask_a = _sample_side(ka, bank_a, batch, n_frames, max_mask_len)
    real_b, mask_b = _sample_side(kb, bank_b, batch, n_frames, max_mask_len)
    return {"real_A": real_a, "mask_A": mask_a, "real_B": real_b, "mask_B": mask_b}


# ---------------------------------------------------------------------------
# Normalization stats + reference-compatible on-disk format
# ---------------------------------------------------------------------------

def compute_norm_stats(mels: List[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Per-speaker mean/std over concatenated frames, eps 1e-9
    (reference preprocess_vcc2018.py:39-41). Returns (M, 1) arrays."""
    cat = np.concatenate(mels, axis=1)
    mean = cat.mean(axis=1, keepdims=True)
    std = cat.std(axis=1, keepdims=True) + 1e-9
    return mean.astype(np.float32), std.astype(np.float32)


def normalize(mels: List[np.ndarray], mean, std) -> List[np.ndarray]:
    return [((m - mean) / std).astype(np.float32) for m in mels]


def save_speaker(out_dir: str, speaker_id: str, normalized: List[np.ndarray],
                 mean: np.ndarray, std: np.ndarray) -> None:
    """Write the reference's on-disk contract (preprocess_vcc2018.py:78-83):
    <dir>/<id>/<id>_normalized.pickle + <id>_norm_stat.npz."""
    d = os.path.join(out_dir, speaker_id)
    os.makedirs(d, exist_ok=True)
    np.savez(os.path.join(d, f"{speaker_id}_norm_stat.npz"), mean=mean, std=std)
    with open(os.path.join(d, f"{speaker_id}_normalized.pickle"), "wb") as f:
        pickle.dump(normalized, f)


def load_speaker(data_dir: str, speaker_id: str):
    """Read the reference's pickle/npz layout (train.py:51-64)."""
    d = os.path.join(data_dir, speaker_id)
    with open(os.path.join(d, f"{speaker_id}_normalized.pickle"), "rb") as f:
        mels = pickle.load(f)
    stats = np.load(os.path.join(d, f"{speaker_id}_norm_stat.npz"))
    return [np.asarray(m, np.float32) for m in mels], stats["mean"], stats["std"]
