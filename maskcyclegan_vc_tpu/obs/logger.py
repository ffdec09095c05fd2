"""Training observability: TB scalars/images/audio, .log file, config snapshot.

Mirrors the reference surface (logger/base_logger.py, train_logger.py:
windowed loss averages printed every ``steps_per_print``, spectrogram
figures, decoded audio clips, plaintext log, args JSON) with a
multi-host-aware design: only host 0 writes, and metrics arrive as
already-computed device scalars fetched asynchronously off the hot path.
"""

from __future__ import annotations

import dataclasses
import io as _io
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


def is_host_zero() -> bool:
    import jax

    return jax.process_index() == 0


class AverageMeter:
    """Windowed scalar average (reference train_logger.py:28-73)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(1, self.count)


class TrainLogger:
    def __init__(
        self,
        save_dir: str,
        name: str,
        steps_per_print: int = 100,
        config: Optional[dict] = None,
        use_tensorboard: bool = True,
    ):
        self.active = is_host_zero()
        self.steps_per_print = steps_per_print
        self.meters: Dict[str, AverageMeter] = defaultdict(AverageMeter)
        self.tb = None
        self._t_iter = time.time()
        self._buffer = []  # (batch_size, {name: device scalar}) per step
        if not self.active:
            return
        self.run_dir = os.path.join(save_dir, name)
        os.makedirs(self.run_dir, exist_ok=True)
        self.log_path = os.path.join(self.run_dir, f"{name}.log")
        if config is not None:
            with open(os.path.join(self.run_dir, "train_args.json"), "w") as f:
                json.dump(config, f, indent=4, sort_keys=True, default=str)
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(
                    log_dir=os.path.join(save_dir, "logs", f"{name}_{int(time.time())}")
                )
            except Exception:
                self.tb = None
        if config is not None:
            self.log_hparams(config)

    def write(self, msg: str, console: bool = True):
        if not self.active:
            return
        if console:
            print(msg, flush=True)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")

    def log_iter(self, step: int, epoch: int, metrics: Dict[str, float],
                 batch_size: int = 1):
        """Accumulate; print + write every ``steps_per_print`` steps.

        Metric values may be device arrays: they are buffered as-is and
        only converted to host floats at the print boundary, so the hot
        loop never blocks on a device->host fetch (the reference syncs
        implicitly every iteration via ``.item()``-style reads;
        train_logger.py:121-150 sets the print cadence we match).
        """
        if not self.active:
            return
        self._buffer.append((batch_size, metrics))
        if step % self.steps_per_print == 0 and step > 0:
            for n, md in self._buffer:
                for k, v in md.items():
                    self.meters[k].update(float(v), n)
            self._buffer.clear()
            dt = (time.time() - self._t_iter) / max(1, self.steps_per_print)
            self._t_iter = time.time()
            parts = [f"[epoch {epoch} step {step}]"] + [
                f"{k}: {m.avg:.5f}" for k, m in sorted(self.meters.items())
            ] + [f"({dt * 1e3:.1f} ms/it)"]
            self.write(" ".join(parts))
            if self.tb is not None:
                for k, m in self.meters.items():
                    self.tb.add_scalar(k.replace("_", "/", 1), m.avg, step)
            for m in self.meters.values():
                m.reset()

    def log_audio(self, tag: str, audio: np.ndarray, step: int, sample_rate: int = 22050):
        if not self.active:
            return
        try:
            if self.tb is not None:
                self.tb.add_audio(tag, np.asarray(audio).reshape(-1, 1), step,
                                  sample_rate)
        except Exception:
            # tensorboardX audio needs soundfile, which may be absent;
            # fall back to dropping a wav next to the log.
            from maskcyclegan_vc_tpu.data.audio_io import write_wav

            path = os.path.join(self.run_dir, f"{tag}_{step}.wav")
            write_wav(path, np.asarray(audio), sample_rate)

    def log_hparams(self, config: dict):
        """Write every hyperparameter as TB text under ``hparams/<key>``
        (reference train_logger.py:108-119)."""
        if not self.active or self.tb is None:
            return
        for k in sorted(config):
            try:
                self.tb.add_text(f"hparams/{k}", str(config[k]), 0)
            except Exception:
                pass

    @staticmethod
    def _render_mel(mel: np.ndarray) -> Optional[np.ndarray]:
        """Render a mel (M, T) to an RGB array (reference utils.py:42-65)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(6, 3))
            ax.imshow(np.asarray(mel), origin="lower", aspect="auto", cmap="magma")
            ax.set_xlabel("frame")
            ax.set_ylabel("mel bin")
            fig.tight_layout()
            buf = _io.BytesIO()
            fig.savefig(buf, format="png", dpi=80)
            plt.close(fig)
            buf.seek(0)
            import PIL.Image

            return np.asarray(PIL.Image.open(buf).convert("RGB"))
        except Exception:
            return None

    def log_spectrogram(self, tag: str, mel: np.ndarray, step: int):
        """One mel figure to TB."""
        if not self.active or self.tb is None:
            return
        img = self._render_mel(mel)
        if img is not None:
            self.tb.add_image(tag, img, step, dataformats="HWC")

    def log_spectrogram_grid(self, mels: Dict[str, np.ndarray], step: int):
        """Combined figure grid, 2 panels per row, tag = joined panel names
        (reference train_logger.visualize_outputs / utils.visualize)."""
        if not self.active or self.tb is None:
            return
        imgs = [self._render_mel(m) for m in mels.values()]
        imgs = [i for i in imgs if i is not None]
        if not imgs:
            return
        h = max(i.shape[0] for i in imgs)
        w = max(i.shape[1] for i in imgs)
        padded = []
        for i in imgs:
            canvas = np.full((h, w, 3), 255, np.uint8)
            canvas[: i.shape[0], : i.shape[1]] = i
            padded.append(canvas)
        if len(padded) % 2:
            padded.append(np.full((h, w, 3), 255, np.uint8))
        rows = [np.concatenate(padded[r : r + 2], axis=1)
                for r in range(0, len(padded), 2)]
        grid = np.concatenate(rows, axis=0)
        self.tb.add_image("-".join(mels), grid, step, dataformats="HWC")

    def close(self):
        if not self.active:
            return
        if self._buffer:  # flush a partial window so no metrics are lost
            for n, md in self._buffer:
                for k, v in md.items():
                    self.meters[k].update(float(v), n)
            self._buffer.clear()
            self.write(" ".join(
                ["[final]"] + [f"{k}: {m.avg:.5f}"
                               for k, m in sorted(self.meters.items())]))
        if self.tb is not None:
            self.tb.close()
