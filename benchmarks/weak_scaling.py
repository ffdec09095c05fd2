"""Weak-scaling harness: fixed per-device batch, 1..N devices.

Emits one JSON line per device count with audio-seconds/s and the
scaling efficiency vs the 1-device run — the BASELINE.md scaling row
(>=85% efficiency 1->N) made turnkey: run it on a pod slice as-is, or
on the virtual CPU mesh for plumbing validation:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/weak_scaling.py --per_device_batch 2 --frames 32

On real hardware the numbers are meaningful; on the virtual mesh only
the sharding/collective plumbing is (all "devices" share the host CPU,
so efficiency trivially degrades ~1/N there).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--per_device_batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument("--grad_allreduce_dtype",
                   choices=["float32", "bfloat16"], default="float32",
                   help="gradient all-reduce wire dtype; bfloat16 routes "
                        "through the explicit shard_map step "
                        "(parallel/mesh.make_shardmap_train_step) — A/B "
                        "this on a multi-slice pod where the collective "
                        "rides DCN (COVERAGE.md scaling roofline)")
    p.add_argument("--device_counts", type=int, nargs="*", default=None,
                   help="default: powers of 2 up to the device count")
    args = p.parse_args()

    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskcyclegan_vc_tpu.parallel.mesh import (
        make_mesh,
        make_sharded_train_step,
        replicate,
        shard_batch,
    )
    from maskcyclegan_vc_tpu.train.schedules import ScheduleConfig
    from maskcyclegan_vc_tpu.train.state import TrainConfig, create_train_state

    n_all = len(jax.devices())
    counts = args.device_counts
    if not counts:
        counts = [c for c in (1, 2, 4, 8, 16, 32, 64) if c <= n_all]

    hop, sr = 256, 22050
    base_rate = base_n = None
    for n in counts:
        b = args.per_device_batch * n
        cfg = TrainConfig(
            schedule=ScheduleConfig(num_epochs=10, n_samples=max(81, b),
                                    batch_size=b, decay_after=10**9,
                                    stop_identity_after=10**9),
            num_frames=args.frames,
            dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None,
        )
        mesh = make_mesh(jax.devices()[:n])
        state = replicate(create_train_state(cfg, seed=0), mesh)
        if args.grad_allreduce_dtype != "float32":
            from maskcyclegan_vc_tpu.parallel.mesh import (
                make_shardmap_train_step,
            )

            step = make_shardmap_train_step(
                cfg, mesh, allreduce_dtype=args.grad_allreduce_dtype)
        else:
            step = make_sharded_train_step(cfg, mesh)
        rs = np.random.RandomState(0)
        batch = shard_batch({
            "real_A": jnp.asarray(rs.randn(b, 80, args.frames), jnp.float32),
            "mask_A": jnp.ones((b, 80, args.frames), jnp.float32),
            "real_B": jnp.asarray(rs.randn(b, 80, args.frames), jnp.float32),
            "mask_B": jnp.ones((b, 80, args.frames), jnp.float32),
        }, mesh)

        for _ in range(max(1, args.warmup)):
            state, metrics = step(state, batch)
        float(metrics["g_loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, batch)
        final = float(metrics["g_loss"])
        dt = (time.perf_counter() - t0) / args.steps
        assert np.isfinite(final)

        audio_s = b * args.frames * hop / sr
        rate = audio_s / dt
        if base_rate is None:
            base_rate, base_n = rate, n
        # Weak-scaling efficiency: per-device throughput vs the FIRST
        # measured count's per-device throughput (base_n need not be 1).
        print(json.dumps({
            "devices": n,
            "grad_allreduce_dtype": args.grad_allreduce_dtype,
            "global_batch": b,
            "audio_s_per_s": round(rate, 2),
            "step_time_ms": round(dt * 1e3, 2),
            "base_devices": base_n,
            "efficiency_vs_base": round((rate / n) / (base_rate / base_n), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
