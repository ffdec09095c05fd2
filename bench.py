"""Benchmark: audio-seconds/s/chip at the full training step.

Runs the fused two-sided CycleGAN train step (2 generators + 4
discriminators, G and D updates) at BASELINE config 2 — batch 32,
128-frame crops — on the default (TPU) platform and reports throughput
in seconds-of-audio processed per wall-second per chip.

One crop covers frames*hop/sr = 128*256/22050 = 1.486 s of audio, so a
step processes 47.55 audio-seconds.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so
the ratio is against REALTIME (1.0 = training consumes audio as fast as
it plays) — the natural absolute yardstick for speech pipelines.

The default invocation measures every headline config in ONE run and
prints ONE merged JSON line, so the round artifact (BENCH_r*.json) is
self-contained:

  * identity-on step (BASELINE config 2) — the primary metric block;
  * identity-off step (``identity_off_*`` keys) — the steady state for
    ~98% of the canonical 500k-step run (stop_identity_after=1e4);
  * train + in-loop MelGAN vocoder decode (``e2e_vocoder_*`` keys,
    BASELINE config 5);
  * the reference's canonical batch-1 scan config
    (``batch1_scan_ms_per_it``).

``--all 0`` restricts to the single config selected by ``--identity`` /
``--vocoder`` (the pre-round-5 behavior, useful for A/B runs).

Usage: python bench.py [--batch 32] [--frames 128] [--steps 20]
                       [--dtype bfloat16] [--all 0|1] [--vocoder 0|1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def peak_flops_per_s(device) -> float:
    """bf16 peak per chip by device kind (0.0 = unknown)."""
    kind = getattr(device, "device_kind", "").lower()
    for pat, peak in (
        ("v6", 918e12),  # Trillium
        ("v5p", 459e12),
        ("v5", 197e12),  # v5e reports "TPU v5 lite"
        ("v4", 275e12),
    ):
        if pat in kind:
            return peak
    return 0.0


def bench_step_config(args, with_identity: bool, vocoder: bool):
    """Measure one step variant; returns (ms/step, flops/step)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskcyclegan_vc_tpu.train.schedules import ScheduleConfig
    from maskcyclegan_vc_tpu.train.state import TrainConfig, create_train_state
    from maskcyclegan_vc_tpu.train.step import make_jit_train_step

    cfg = TrainConfig(
        schedule=ScheduleConfig(
            num_epochs=1000, n_samples=81, batch_size=args.batch,
            decay_after=200_000, stop_identity_after=10_000,
        ),
        num_frames=args.frames,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None,
        fused_norms=bool(args.fused_norms),
        k3_matmul=bool(args.k3_matmul),
        split_gated_conv=bool(args.split_gated),
    )
    state = create_train_state(cfg, seed=0)
    step = make_jit_train_step(cfg, with_identity=with_identity)

    if vocoder:
        from maskcyclegan_vc_tpu.models.melgan import MelGANGenerator
        from maskcyclegan_vc_tpu.train.step import make_train_step
        from maskcyclegan_vc_tpu.utils.init import fast_init

        # bf16 decode: the vocoder is bandwidth-bound (models/melgan.py
        # docstring); in-loop eval audio tolerates the < 1e-4 deviation.
        melgan = MelGANGenerator(
            dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None)
        mel_params = fast_init(melgan, 0, jnp.zeros((1, 80, 8)))
        base_step = make_train_step(cfg, with_identity=with_identity,
                                    with_eval_fake=True)

        def _step_and_decode(st, batch):
            # One executable: train step + MelGAN vocode of the A->B
            # conversion under the freshly-updated generator (the in-loop
            # waveform eval path, reference train.py:332-358). The step
            # exports the conversion it already computed for the D update
            # (with_eval_fake), so the marginal cost is just the MelGAN
            # stack (~19 ms) — a second dispatch re-reading params and
            # recomputing the forward measured ~28 ms, and XLA does not
            # CSE the recompute across the Pallas custom calls.
            st2, metrics = base_step(st, batch)
            wav = melgan.apply(mel_params, metrics.pop("fake_B_eval"))
            return st2, metrics, wav

        step = jax.jit(_step_and_decode, donate_argnums=(0,))

    rs = np.random.RandomState(0)

    def make_batch():
        return {
            "real_A": jnp.asarray(
                rs.randn(args.batch, 80, args.frames), jnp.float32),
            "mask_A": jnp.ones((args.batch, 80, args.frames), jnp.float32),
            "real_B": jnp.asarray(
                rs.randn(args.batch, 80, args.frames), jnp.float32),
            "mask_B": jnp.ones((args.batch, 80, args.frames), jnp.float32),
        }

    batches = [make_batch() for _ in range(2)]

    def step_flops(st, batch):
        """Per-step FLOPs from XLA's own cost model (for the MFU line).

        AOT-lowered before the timing loop (donation hasn't consumed the
        state yet; the persistent compilation cache makes it cheap).
        """
        try:
            ca = step.lower(st, batch).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0))
        except Exception:
            return 0.0

    flops = step_flops(state, batches[0])

    wav = None
    for i in range(max(1, args.warmup)):  # >=1 so compile stays out of timing
        if vocoder:
            state, metrics, wav = step(state, batches[i % 2])
        else:
            state, metrics = step(state, batches[i % 2])
    float(metrics["g_loss"])  # value fetch: block_until_ready is unreliable
    # on the tunneled axon platform, but a scalar fetch forces the chain.
    if vocoder:
        float(wav[0, 0])

    t0 = time.perf_counter()
    for i in range(args.steps):
        if vocoder:
            state, metrics, wav = step(state, batches[i % 2])
        else:
            state, metrics = step(state, batches[i % 2])
    final = float(metrics["g_loss"])  # forces all chained steps
    if vocoder:
        assert np.isfinite(float(wav[0, 0]))
        assert wav.shape == (args.batch, args.frames * 256)
    dt = (time.perf_counter() - t0) / args.steps
    assert np.isfinite(final)
    return dt, flops


def bench_batch1(args):
    """Canonical reference config (batch 1, 64 frames, ~81 iters/epoch) on
    the production scan-epoch path — the config the reference actually
    trains; per-step host dispatch would dominate it without scan."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks._canonical import STEPS_PER_EPOCH, canonical_batch1_setup

    st1, bank, epoch_fn = canonical_batch1_setup(
        jnp.bfloat16 if args.dtype == "bfloat16" else None,
        bool(args.fused_norms),
    )
    key = jax.random.PRNGKey(0)
    st1, stacked = epoch_fn(st1, bank, bank, key)  # compile + warmup
    float(stacked["g_loss"][-1])
    n_epochs = 3
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        st1, stacked = epoch_fn(st1, bank, bank, key)
    assert np.isfinite(float(stacked["g_loss"][-1]))
    dt1 = (time.perf_counter() - t0) / (n_epochs * STEPS_PER_EPOCH)
    return {
        "batch1_scan_ms_per_it": round(dt1 * 1e3, 2),
        "batch1_audio_s_per_s": round((64 * 256 / 22050) / dt1, 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=128)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("--fused_norms", type=int, default=1)
    p.add_argument("--k3_matmul", type=int, default=0,
                   help="A/B: residual-stack k3 convs as shifted matmuls")
    p.add_argument("--split_gated", type=int, default=0,
                   help="A/B: paired downsample convs as separate convs")
    p.add_argument("--all", type=int, default=1,
                   help="1: measure identity-on, identity-off, vocoder-e2e "
                        "and batch-1 scan in one merged JSON line (the "
                        "self-contained round artifact); 0: only the config "
                        "selected by --identity/--vocoder")
    p.add_argument("--identity", type=int, default=1,
                   help="(with --all 0) 0: bench the post-stop_identity_after "
                        "executable (the steady state for ~98%% of the "
                        "canonical run)")
    p.add_argument("--vocoder", type=int, default=0,
                   help="(with --all 0) 1: decode converted mels with MelGAN "
                        "in-loop (BASELINE config 5)")
    p.add_argument("--batch1", type=int, default=1,
                   help="also measure the canonical batch-1 scan config "
                        "(bash_scripts/mask_cyclegan_train.sh:16,18); "
                        "0 skips its extra scan compile")
    p.add_argument("--platform", type=str, default=None,
                   help="override platform (e.g. cpu for smoke)")
    args = p.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )

    hop, sr = 256, 22050
    audio_seconds_per_step = args.batch * args.frames * hop / sr
    peak = peak_flops_per_s(jax.devices()[0])

    if args.all:
        dt, flops = bench_step_config(args, with_identity=True, vocoder=False)
        dt_off, _ = bench_step_config(args, with_identity=False, vocoder=False)
        dt_voc, _ = bench_step_config(args, with_identity=True, vocoder=True)
        extra = {
            "identity_off_step_ms": round(dt_off * 1e3, 2),
            "identity_off_audio_s_per_s": round(audio_seconds_per_step / dt_off, 2),
            "e2e_vocoder_step_ms": round(dt_voc * 1e3, 2),
            "e2e_vocoder_audio_s_per_s": round(audio_seconds_per_step / dt_voc, 2),
        }
        metric_suffix = ""
    else:
        vocoder = bool(args.vocoder)
        dt, flops = bench_step_config(
            args, with_identity=bool(args.identity), vocoder=vocoder)
        extra = {}
        metric_suffix = "_e2e" if vocoder else ""

    batch1 = bench_batch1(args) if args.batch1 else {}

    value = audio_seconds_per_step / dt
    result = {
        "metric": "audio_seconds_per_second_per_chip" + metric_suffix,
        "value": round(value, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value, 2),  # baseline = realtime (see docstring)
        "step_time_ms": round(dt * 1e3, 2),
        "batch": args.batch,
        "frames": args.frames,
        "dtype": args.dtype,
        "device": str(jax.devices()[0]),
        # Speed-of-light accounting (XLA cost model): achieved TFLOP/s and
        # model FLOPs utilization vs the chip's bf16 peak. MFU is only
        # meaningful against the bf16 peak, so it is omitted for float32
        # runs (whose MXU passes have a different, precision-dependent peak).
        "step_tflop": round(flops / 1e12, 2),
        "tflops_per_s": round(flops / dt / 1e12, 1) if flops else None,
        "mfu": round(flops / dt / peak, 3)
               if flops and peak and args.dtype == "bfloat16" else None,
        **extra,
        **batch1,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
