"""Component microbenchmarks on the current default platform (TPU).

Prints one JSON line per benchmark:
  * mel frontend: Pallas fused kernel vs XLA, audio-seconds/s
  * generator inference: conversion throughput (chained forwards)
  * MelGAN decode: vocoder audio-seconds/s
  * train step at several batch sizes

All timings use chained calls with a final value fetch (the tunneled
platform's block_until_ready is unreliable, obs/profiler.py note).

    python -m benchmarks.bench_components [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _report(**kw):
    print(json.dumps(kw), flush=True)


def bench_melspec(quick=False):
    import jax, jax.numpy as jnp, numpy as np
    from maskcyclegan_vc_tpu.data.melspec import log_mel_spectrogram
    from maskcyclegan_vc_tpu.ops.pallas.melspec_kernel import log_mel_spectrogram_pallas

    secs = 10 if quick else 40
    rs = np.random.RandomState(0)
    x = jnp.asarray((rs.randn(8, 22050 * secs) * 0.3).astype(np.float32))
    audio_s = 8 * secs
    xla = jax.jit(log_mel_spectrogram)

    for name, fn in (("melspec_pallas", log_mel_spectrogram_pallas),
                     ("melspec_xla", xla)):
        y = fn(x); float(jnp.sum(y[..., -1]))
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            y = fn(x)
        float(jnp.sum(y[..., -1]))
        dt = (time.perf_counter() - t0) / n
        _report(bench=name, audio_s_per_s=round(audio_s / dt, 1),
                ms=round(dt * 1e3, 2))


def bench_generator_inference(quick=False):
    import jax, jax.numpy as jnp, numpy as np
    from maskcyclegan_vc_tpu.models import Generator
    from maskcyclegan_vc_tpu.utils.init import fast_init

    B, T = (8, 256) if quick else (16, 512)
    gen = Generator(dtype=jnp.bfloat16, fused_norms=True)
    x = jnp.asarray(np.random.RandomState(0).randn(B, 80, T), jnp.float32)
    mask = jnp.ones_like(x)
    params = fast_init(gen, 0, x, mask)
    f = jax.jit(lambda x: gen.apply(params, x, mask))
    y = f(x); float(y[0, 0, 0])
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(y)  # chained
    float(y[0, 0, 0])
    dt = (time.perf_counter() - t0) / n
    audio_s = B * T * 256 / 22050
    _report(bench="generator_inference", batch=B, frames=T,
            audio_s_per_s=round(audio_s / dt, 1), ms=round(dt * 1e3, 2))


def bench_vocoder(quick=False):
    import jax, jax.numpy as jnp, numpy as np
    from maskcyclegan_vc_tpu.models.melgan import MelGANGenerator
    from maskcyclegan_vc_tpu.utils.init import fast_init

    B, T = (2, 128) if quick else (4, 256)
    gen = MelGANGenerator()
    mel = jnp.asarray(np.random.RandomState(0).randn(B, 80, T), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel)
    f = jax.jit(lambda m: gen.apply(params, m))
    y = f(mel); float(y[0, 0])
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(mel)
    float(y[0, 0])
    dt = (time.perf_counter() - t0) / n
    audio_s = B * T * 256 / 22050
    _report(bench="melgan_decode", batch=B, frames=T,
            audio_s_per_s=round(audio_s / dt, 1), ms=round(dt * 1e3, 2))


def bench_train_step_batches(quick=False):
    import jax, jax.numpy as jnp, numpy as np
    from maskcyclegan_vc_tpu.train.schedules import ScheduleConfig
    from maskcyclegan_vc_tpu.train.state import TrainConfig, create_train_state
    from maskcyclegan_vc_tpu.train.step import make_jit_train_step

    for batch in ((8,) if quick else (8, 32, 64)):
        cfg = TrainConfig(
            schedule=ScheduleConfig(num_epochs=1000, n_samples=81,
                                    batch_size=batch),
            num_frames=128, dtype=jnp.bfloat16, fused_norms=True)
        state = create_train_state(cfg, seed=0)
        step = make_jit_train_step(cfg)
        rs = np.random.RandomState(0)
        b = {k: (jnp.asarray(rs.randn(batch, 80, 128), jnp.float32)
                 if "real" in k else jnp.ones((batch, 80, 128), jnp.float32))
             for k in ("real_A", "mask_A", "real_B", "mask_B")}
        state, m = step(state, b); float(m["g_loss"])
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, b)
        float(m["g_loss"])
        dt = (time.perf_counter() - t0) / n
        _report(bench="train_step", batch=batch, frames=128,
                audio_s_per_s=round(batch * 128 * 256 / 22050 / dt, 1),
                ms=round(dt * 1e3, 2))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--only", type=str, default=None)
    args = p.parse_args()
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    benches = {
        "melspec": bench_melspec,
        "generator": bench_generator_inference,
        "vocoder": bench_vocoder,
        "train": bench_train_step_batches,
    }
    for name, fn in benches.items():
        if args.only and name != args.only:
            continue
        fn(args.quick)


if __name__ == "__main__":
    main()
