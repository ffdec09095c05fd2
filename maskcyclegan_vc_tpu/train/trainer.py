"""Training orchestration: data -> sharded step -> logging -> checkpoints.

The jitted step (train/step.py) is the hot loop; everything here stays
off it: batches are sampled on device from a folded key, metrics are
fetched asynchronously, checkpoints/plots run on host 0 at epoch
cadence. Mirrors the reference's training surface
(/root/reference/mask_cyclegan_vc/train.py:175-375) with a pure-resume
contract (state + step live in one checkpoint; schedules are functions
of step).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from maskcyclegan_vc_tpu.data.dataset import MelBank, load_speaker, sample_batch
from maskcyclegan_vc_tpu.io.checkpoint import (
    AsyncSaver,
    checkpoint_path,
    latest_epoch,
    load_checkpoint,
    rotate_checkpoints,
    save_checkpoint,
)
from maskcyclegan_vc_tpu.obs.logger import TrainLogger
from maskcyclegan_vc_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_train_step,
    replicate,
    shard_batch,
)
from maskcyclegan_vc_tpu.train.schedules import ScheduleConfig
from maskcyclegan_vc_tpu.train.state import TrainConfig, create_train_state


# Scalars plumbed to the logger/TB each step — the reference logs only
# g_loss/d_loss (train.py:302-304); the per-term decomposition (adversarial,
# cycle, identity, first/second-step D) comes free from the fused step.
LOGGED_METRICS = ("g_loss", "d_loss", "g_adv_loss", "g_cycle_loss",
                  "g_identity_loss", "d_loss_first", "d_loss_second")


@dataclasses.dataclass
class TrainerArgs:
    """Run-level knobs (flag names follow the reference parsers)."""

    name: str = "mask_cyclegan_vc"
    save_dir: str = "results"
    seed: int = 0
    speaker_A_id: str = "VCC2SF3"
    speaker_B_id: str = "VCC2TF1"
    preprocessed_data_dir: str = "vcc2018_preprocessed/vcc2018_training"
    num_epochs: int = 6172
    batch_size: int = 1
    num_frames: int = 64
    max_mask_len: int = 25
    generator_lr: float = 2e-4
    discriminator_lr: float = 1e-4
    decay_after: int = 200_000
    stop_identity_after: int = 10_000
    cycle_loss_lambda: float = 10.0
    identity_loss_lambda: float = 5.0
    epochs_per_save: int = 100
    epochs_per_plot: int = 10
    steps_per_print: int = 100
    max_ckpts: int = 0  # 0 = keep all
    continue_train: bool = False
    ref_compat_lr: bool = False
    n_mels: int = 80
    residual_channels: int = 256
    dtype: str = "auto"  # auto -> bfloat16 on TPU, float32 elsewhere
    precision: Optional[str] = None
    fused_norms: str = "auto"  # auto -> Pallas fused IN(+gate) on TPU
    remat: bool = False  # rematerialize G forwards in the G step
    scan_epochs: bool = True  # single-device: one lax.scan program per epoch
    sample_rate: int = 22050
    vocoder_ckpt: Optional[str] = None  # torch melgan state_dict for audio logs
    # TB audio at plot cadence (reference train.py:332-358 always decodes
    # audio): "auto" = MelGAN when --vocoder_ckpt is given, else
    # Griffin-Lim (vocoder-free, data/griffin_lim.py); "off" disables.
    plot_audio: str = "auto"
    # Wire dtype for the DP gradient all-reduce. None/"float32" keeps the
    # GSPMD path (XLA-placed f32 collectives — the right default within a
    # slice, ~97% predicted efficiency); "bfloat16" selects the explicit
    # shard_map path with compressed-wire psums, halving collective bytes
    # for cross-slice DCN links (COVERAGE.md scaling roofline).
    grad_allreduce_dtype: Optional[str] = None
    # Overlap the ~1 GB checkpoint file write with the following epochs
    # (io/checkpoint.AsyncSaver; the device->host fetch stays
    # synchronous). 0 to force fully synchronous saves.
    async_save: bool = True
    # Sanitizer cadence (SURVEY §5.2, utils/debug.check_finite):
    # "metrics" (default) raises at epoch end if any logged loss went
    # NaN/Inf — one host-side isfinite over scalars already fetched for
    # logging, so it is free; "params" additionally sweeps the full
    # state pytree before every checkpoint write, so a poisoned run can
    # never overwrite its last good checkpoint; "off" disables both.
    finite_check: str = "metrics"


class Trainer:
    def __init__(self, args: TrainerArgs):
        self.args = args
        a = args

        self.mels_A, self.mean_A, self.std_A = load_speaker(
            a.preprocessed_data_dir, a.speaker_A_id)
        self.mels_B, self.mean_B, self.std_B = load_speaker(
            a.preprocessed_data_dir, a.speaker_B_id)
        self.bank_A = MelBank.from_list(self.mels_A, min_frames=a.num_frames)
        self.bank_B = MelBank.from_list(self.mels_B, min_frames=a.num_frames)
        n_samples = min(len(self.bank_A), len(self.bank_B))

        sched = ScheduleConfig(
            generator_lr=a.generator_lr,
            discriminator_lr=a.discriminator_lr,
            decay_after=a.decay_after,
            stop_identity_after=a.stop_identity_after,
            num_epochs=a.num_epochs,
            n_samples=n_samples,
            batch_size=a.batch_size,
            identity_loss_lambda=a.identity_loss_lambda,
            cycle_loss_lambda=a.cycle_loss_lambda,
            ref_compat_lr=a.ref_compat_lr,
        )
        # Production defaults resolve per-backend so the documented train
        # command gets the fast path on TPU (bf16 MXU compute + Pallas
        # fused norm epilogues) without extra flags, while CPU runs keep
        # float32/XLA for parity and debugging.
        backend = jax.default_backend()
        dtype = a.dtype
        if dtype == "auto":
            dtype = "bfloat16" if backend == "tpu" else "float32"
        fused = a.fused_norms
        if isinstance(fused, str):
            fused = (backend == "tpu") if fused == "auto" else fused in ("1", "true", "True")
        self.cfg = TrainConfig(
            schedule=sched,
            n_mels=a.n_mels,
            num_frames=a.num_frames,
            residual_channels=a.residual_channels,
            dtype=jnp.bfloat16 if dtype == "bfloat16" else None,
            precision=a.precision,
            fused_norms=bool(fused),
            remat=a.remat,
        )

        self.mesh = make_mesh()
        self.n_devices = self.mesh.devices.size
        if a.batch_size % max(1, self.n_devices) != 0 and a.batch_size > self.n_devices:
            raise ValueError(
                f"batch_size {a.batch_size} not divisible by {self.n_devices} devices")

        self.state = create_train_state(self.cfg, seed=a.seed)
        self.start_epoch = 1
        self.ckpt_dir = os.path.join(a.save_dir, a.name, "ckpts")
        if a.continue_train:
            last = latest_epoch(self.ckpt_dir)
            if last is not None:
                self.state = load_checkpoint(
                    checkpoint_path(self.ckpt_dir, last), self.state)
                self.start_epoch = last + 1

        # Small batches can't shard across more devices than samples;
        # fall back to single-device jit in that case (the reference's
        # canonical config is batch_size=1).
        # Two step executables (identity on/off, see train/step.py) built
        # lazily — the trainer switches at the stop_identity_after
        # boundary instead of carrying a lax.cond in the graph.
        self._step_fns = {}
        sharded = (a.batch_size >= self.n_devices
                   and a.batch_size % self.n_devices == 0)
        self._compress_grads = a.grad_allreduce_dtype not in (
            None, "", "float32", "f32")
        if sharded:
            self.state = replicate(self.state, self.mesh)
            if self._compress_grads:
                from maskcyclegan_vc_tpu.parallel.mesh import (
                    make_shardmap_train_step,
                )

                self._make_step = lambda wi: make_shardmap_train_step(
                    self.cfg, self.mesh, with_identity=wi,
                    allreduce_dtype=a.grad_allreduce_dtype)
            else:
                self._make_step = lambda wi: make_sharded_train_step(
                    self.cfg, self.mesh, with_identity=wi)
            self._shard = lambda b: shard_batch(b, self.mesh)
        else:
            from maskcyclegan_vc_tpu.train.step import make_jit_train_step

            if self.n_devices > 1:
                print(
                    f"WARNING: batch_size {a.batch_size} < {self.n_devices} "
                    "devices — falling back to single-device training; raise "
                    "--batch_size to a multiple of the device count to use "
                    "the full mesh.", flush=True)
            self._make_step = lambda wi: make_jit_train_step(
                self.cfg, with_identity=wi)
            self._shard = lambda b: b
        self._identity_cutoff = a.stop_identity_after // a.batch_size
        # Epochs execute as ONE device program (lax.scan over steps with
        # on-device sampling) — per-step host dispatch dominates the
        # canonical batch-1 config (87 -> 30 -> 14 ms/it measured on
        # v5e). The sharded variant constrains the sampled batch to
        # P('data') so GSPMD partitions exactly like the host loop, and
        # runs multi-process too: banks are replicated (every host loads
        # the same preprocessed files) and sampling is a pure function of
        # fold_in(base_key, step), so all processes execute the same scan
        # program over their addressable shards — validated against the
        # single-process trajectory by tests/test_multiprocess.py. Only
        # the unsharded multi-process fallback keeps the host loop.
        self._sharded = sharded
        self._use_scan = a.scan_epochs and (
            jax.process_count() == 1 or sharded)
        self._scan_fns = {}

        self.logger = TrainLogger(
            a.save_dir, a.name, steps_per_print=a.steps_per_print,
            config=dataclasses.asdict(a))
        self._saver = AsyncSaver()
        self.base_key = jax.random.PRNGKey(a.seed)
        self.steps_per_epoch = sched.steps_per_epoch

        # Eval/plot conversion path: one float32 generator (plots should
        # not inherit the training compute dtype) jitted once; jax.jit
        # recompiles per bucket length and caches thereafter.
        from maskcyclegan_vc_tpu.train.state import build_models

        eval_cfg = dataclasses.replace(
            self.cfg, dtype=None, fused_norms=False, remat=False)
        eval_gen, _ = build_models(eval_cfg)
        self._convert_fn = jax.jit(
            lambda p, x, m, l: eval_gen.apply(p, x, m, lengths=l))

        self._vocoder = None
        if a.vocoder_ckpt:
            self._vocoder = self._load_vocoder(a.vocoder_ckpt)

    def _step_fn(self, step: int):
        """Executable for this step: identity on until the cutoff, off after."""
        wi = step <= self._identity_cutoff
        if wi not in self._step_fns:
            self._step_fns[wi] = self._make_step(wi)
        return self._step_fns[wi]

    def _load_vocoder(self, path):
        import torch

        from maskcyclegan_vc_tpu.models.melgan import (
            MelGANGenerator,
            melgan_params_from_torch,
        )

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        gen = MelGANGenerator()
        params = jax.tree.map(jnp.asarray, melgan_params_from_torch(sd))
        return gen, params

    def _scan_fn(self, step: int):
        wi = step <= self._identity_cutoff
        if wi not in self._scan_fns:
            a = self.args
            if self._sharded and self._compress_grads:
                from maskcyclegan_vc_tpu.parallel.mesh import (
                    make_shardmap_scan_epoch,
                )

                self._scan_fns[wi] = make_shardmap_scan_epoch(
                    self.cfg, self.mesh, wi, self.steps_per_epoch,
                    a.batch_size, a.num_frames, a.max_mask_len,
                    allreduce_dtype=a.grad_allreduce_dtype)
            elif self._sharded:
                from maskcyclegan_vc_tpu.parallel.mesh import (
                    make_sharded_scan_epoch,
                )

                self._scan_fns[wi] = make_sharded_scan_epoch(
                    self.cfg, self.mesh, wi, self.steps_per_epoch,
                    a.batch_size, a.num_frames, a.max_mask_len)
            else:
                from maskcyclegan_vc_tpu.train.step import make_scan_epoch

                self._scan_fns[wi] = make_scan_epoch(
                    self.cfg, wi, self.steps_per_epoch, a.batch_size,
                    a.num_frames, a.max_mask_len)
        return self._scan_fns[wi]

    def _check_metrics_finite(self, vals, epoch: int) -> None:
        """Raise if any logged loss went NaN/Inf (SURVEY §5.2 cadence).

        ``vals`` is host-side (already fetched for logging), so this is a
        free scalar sweep; a GAN that diverges poisons every later step,
        so an end-of-epoch check loses at most one epoch of signal.
        """
        if self.args.finite_check != "off":
            from maskcyclegan_vc_tpu.utils.debug import check_finite

            check_finite(vals, f"train metrics at epoch {epoch} (rerun "
                               "under utils.debug.nan_debug_mode to "
                               "localize the producing op)")

    def train(self):
        a = self.args
        step = int(jax.device_get(self.state.step))
        for epoch in range(self.start_epoch, a.num_epochs + 1):
            t0 = time.time()
            if self._use_scan:
                self.state, stacked = self._scan_fn(step)(
                    self.state, self.bank_A, self.bank_B, self.base_key)
                # One host fetch per epoch, then feed the logger per step.
                vals = jax.device_get(
                    {k: stacked[k] for k in LOGGED_METRICS})
                self._check_metrics_finite(vals, epoch)
                for j in range(self.steps_per_epoch):
                    step += 1
                    self.logger.log_iter(
                        step, epoch,
                        {k: float(vals[k][j]) for k in vals},
                        batch_size=a.batch_size)
            else:
                metrics = None
                for _ in range(self.steps_per_epoch):
                    key = jax.random.fold_in(self.base_key, step)
                    batch = sample_batch(
                        key, self.bank_A, self.bank_B, a.batch_size,
                        a.num_frames, a.max_mask_len)
                    batch = self._shard(batch)
                    self.state, metrics = self._step_fn(step)(self.state, batch)
                    step += 1
                    self.logger.log_iter(
                        step, epoch,
                        {k: metrics[k] for k in LOGGED_METRICS},
                        batch_size=a.batch_size)
                # One device sync per epoch: NaNs persist once produced,
                # so the last step's scalars witness the whole epoch.
                self._check_metrics_finite(
                    jax.device_get({k: metrics[k] for k in LOGGED_METRICS}),
                    epoch)

            if epoch % a.epochs_per_plot == 0:
                self._plot(epoch)
            if epoch % a.epochs_per_save == 0:
                self._save(epoch)
            self.logger.write(
                f"epoch {epoch} done in {time.time() - t0:.1f}s", console=False)
        # Flush the in-flight async checkpoint write (and surface any
        # write error) before declaring the run finished.
        self._saver.wait()
        self.logger.close()

    def _save(self, epoch: int):
        if jax.process_index() != 0:
            return
        path = checkpoint_path(self.ckpt_dir, epoch)
        # The fetch is synchronous either way — the state's device
        # buffers are donated to the next step executable.
        host_state = jax.device_get(self.state)
        if self.args.finite_check == "params":
            # Never persist a poisoned state over the last good
            # checkpoint (SURVEY §5.2; ~0.2 s/165M floats at save
            # cadence only).
            from maskcyclegan_vc_tpu.utils.debug import check_finite

            check_finite(
                host_state, f"train state at save epoch {epoch}")
        meta = {
            "seed": self.args.seed,
            "epoch": epoch,
            "mean_A": self.mean_A, "std_A": self.std_A,
            "mean_B": self.mean_B, "std_B": self.std_B,
        }

        def _rotate():
            if self.args.max_ckpts > 0:
                rotate_checkpoints(self.ckpt_dir, self.args.max_ckpts)

        if self.args.async_save:
            self._saver.save(path, host_state, meta, on_done=_rotate)
        else:
            save_checkpoint(path, host_state, meta)
            _rotate()

    def _convert(self, mel: np.ndarray, direction: str):
        """Full-utterance conversion (ones mask) with bucketed jit."""
        t = mel.shape[1]
        bucket = ((t + 63) // 64) * 64
        x = np.zeros((1, mel.shape[0], bucket), np.float32)
        x[0, :, :t] = mel
        params = self.state.g_params[direction]
        y = self._convert_fn(params, jnp.asarray(x),
                             jnp.ones((1, mel.shape[0], bucket), jnp.float32),
                             jnp.asarray([t]))
        return np.asarray(y)[0, :, :t]

    def _plot(self, epoch: int):
        if jax.process_index() != 0:
            return
        # Rotate through the validation utterances, one per plot epoch —
        # the reference walks its validation_dataloader so successive plot
        # epochs show different utterances (train.py:317-358).
        idx = (epoch // max(1, self.args.epochs_per_plot) - 1)
        real_A = self.mels_A[idx % len(self.mels_A)]
        real_B = self.mels_B[idx % len(self.mels_B)]
        fake_B = self._convert(real_A, "A2B")
        fake_A = self._convert(real_B, "B2A")
        # Combined 4-panel figure (reference train.py:318-330 logs the
        # panels as one grid image) plus the individual panels.
        self.logger.log_spectrogram_grid(
            {"real_A_spec": real_A, "fake_B_spec": fake_B,
             "real_B_spec": real_B, "fake_A_spec": fake_A}, epoch)
        self.logger.log_spectrogram("real_A_spec", real_A, epoch)
        self.logger.log_spectrogram("fake_B_spec", fake_B, epoch)
        self.logger.log_spectrogram("real_B_spec", real_B, epoch)
        self.logger.log_spectrogram("fake_A_spec", fake_A, epoch)
        if self.args.plot_audio == "off":
            return
        panels = (
            ("real_A_audio", real_A, self.mean_A, self.std_A),
            ("fake_B_audio", fake_B, self.mean_B, self.std_B),
            ("real_B_audio", real_B, self.mean_B, self.std_B),
            ("fake_A_audio", fake_A, self.mean_A, self.std_A),
        )
        if self._vocoder is not None:
            gen, params = self._vocoder
            from maskcyclegan_vc_tpu.models.melgan import decode_mel

            for tag, mel, mean, std in panels:
                wav = np.asarray(decode_mel(
                    gen, params, jnp.asarray(mel)[None],
                    jnp.asarray(mean), jnp.asarray(std)))[0]
                self.logger.log_audio(tag, wav, epoch, self.args.sample_rate)
        else:
            # Vocoder-free fallback: the reference always decodes audio at
            # plot cadence (train.py:332-358); without a MelGAN checkpoint
            # we use Griffin-Lim so the TB audio surface stays populated.
            from maskcyclegan_vc_tpu.data.griffin_lim import (
                decode_mel_griffin_lim,
            )

            for tag, mel, mean, std in panels:
                wav = decode_mel_griffin_lim(mel, mean, std, n_iter=32)
                self.logger.log_audio(tag, wav, epoch, self.args.sample_rate)
