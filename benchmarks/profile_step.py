"""Capture a jax.profiler trace of the train step and summarize top device ops.

Parses the perfetto trace.json.gz written by jax.profiler (no TF needed)
and prints the top-k ops by total device time, so kernel work can be
targeted where the milliseconds actually are.

Usage: python benchmarks/profile_step.py [--batch 32] [--frames 128] [--top 40]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize(trace_dir, top):
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print("no trace.json.gz found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Find device-side process ids (TPU/device tracks).
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "Device" in name or "/device:" in name
    }
    tot = collections.Counter()
    cnt = collections.Counter()
    flops = collections.Counter()
    bytes_ = collections.Counter()
    cat = {}
    src = {}
    by_cat = collections.Counter()
    cat_flops = collections.Counter()
    cat_bytes = collections.Counter()
    wall = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        args = e.get("args") or {}
        # Skip step markers / whole-module aggregates (they double-count).
        if name.startswith("jit_") or name.isdigit() or "hlo_category" not in args:
            continue
        dur = e.get("dur", 0)
        tot[name] += dur
        cnt[name] += 1
        flops[name] += float(args.get("model_flops", 0) or 0)
        bytes_[name] += float(args.get("bytes_accessed", 0) or 0)
        cat[name] = args.get("hlo_category", "?")
        stack = args.get("source_stack", "")
        src[name] = (stack.splitlines()[:2] or [args.get("source", "?")])
        by_cat[cat[name]] += dur
        cat_flops[cat[name]] += float(args.get("model_flops", 0) or 0)
        cat_bytes[cat[name]] += float(args.get("bytes_accessed", 0) or 0)
        wall += dur
    print(f"trace: {path}")
    print(f"total device-op time: {wall/1e3:.2f} ms across {sum(cnt.values())} "
          "HLO-op events (step markers excluded)")
    # v5e roofline constants for %-of-peak accounting (bf16 MXU / HBM).
    PEAK_TFS, PEAK_GBS = 197.0, 819.0
    print("\nby hlo_category (TF/s and GB/s aggregate; % of v5e peak "
          f"{PEAK_TFS:.0f} TF/s | {PEAK_GBS:.0f} GB/s):")
    for c, us in by_cat.most_common():
        tfs = cat_flops[c] / (us * 1e-6) / 1e12 if us else 0.0
        gbs = cat_bytes[c] / (us * 1e-6) / 1e9 if us else 0.0
        print(f"  {us/1e3:>9.2f} ms  {100*us/wall:>5.1f}%  "
              f"{tfs:>6.1f} TF/s ({100*tfs/PEAK_TFS:>4.1f}%)  "
              f"{gbs:>5.0f} GB/s ({100*gbs/PEAK_GBS:>4.1f}%)  {c}")
    print(f"\n{'us_total':>10} {'count':>6} {'us_avg':>9} {'TF/s':>6} "
          f"{'GB/s':>6}  op / category / source")
    for name, us in tot.most_common(top):
        tfs = flops[name] / (us * 1e-6) / 1e12 if us else 0.0
        gbs = bytes_[name] / (us * 1e-6) / 1e9 if us else 0.0
        where = "; ".join(s.strip() for s in src.get(name, []))
        print(f"{us:>10.0f} {cnt[name]:>6} {us/cnt[name]:>9.1f} {tfs:>6.1f} "
              f"{gbs:>6.0f}  {name} [{cat.get(name,'?')}] {where[:110]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=128)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--fused_norms", type=int, default=1)
    p.add_argument("--scan", action="store_true",
                   help="profile the canonical batch-1 scan-epoch program "
                        "(bench.py's batch1_scan_ms_per_it config) instead "
                        "of the batch-32 jit step")
    p.add_argument("--trace_dir", default="/tmp/jax_trace_step")
    p.add_argument("--summarize_only", action="store_true")
    args = p.parse_args()

    if args.summarize_only:
        summarize(args.trace_dir, args.top)
        return

    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    import jax.numpy as jnp
    import numpy as np

    from maskcyclegan_vc_tpu.train.schedules import ScheduleConfig
    from maskcyclegan_vc_tpu.train.state import TrainConfig, create_train_state
    from maskcyclegan_vc_tpu.train.step import make_jit_train_step

    rs = np.random.RandomState(0)

    if args.scan:
        # Canonical reference config: batch 1, 64 frames, 81-step epochs
        # as ONE lax.scan program — the SAME setup bench.py's batch1
        # section times (shared via benchmarks/_canonical.py).
        from benchmarks._canonical import STEPS_PER_EPOCH, canonical_batch1_setup

        steps_per_epoch = STEPS_PER_EPOCH
        st1, bank, epoch_fn = canonical_batch1_setup(
            jnp.bfloat16, bool(args.fused_norms))
        key = jax.random.PRNGKey(0)
        st1, stacked = epoch_fn(st1, bank, bank, key)  # compile + warmup
        float(stacked["g_loss"][-1])
        with jax.profiler.trace(args.trace_dir):
            st1, stacked = epoch_fn(st1, bank, bank, key)
            float(stacked["g_loss"][-1])
        summarize(args.trace_dir, args.top)
        print(f"\n(one {steps_per_epoch}-step scan epoch traced; divide "
              f"the ms column by {steps_per_epoch} for per-step attribution)")
        return

    cfg = TrainConfig(
        schedule=ScheduleConfig(
            num_epochs=1000, n_samples=81, batch_size=args.batch,
            decay_after=200_000, stop_identity_after=10_000,
        ),
        num_frames=args.frames,
        dtype=jnp.bfloat16,
        fused_norms=bool(args.fused_norms),
    )
    state = create_train_state(cfg, seed=0)
    step = make_jit_train_step(cfg)

    batch = {
        "real_A": jnp.asarray(rs.randn(args.batch, 80, args.frames), jnp.float32),
        "mask_A": jnp.ones((args.batch, 80, args.frames), jnp.float32),
        "real_B": jnp.asarray(rs.randn(args.batch, 80, args.frames), jnp.float32),
        "mask_B": jnp.ones((args.batch, 80, args.frames), jnp.float32),
    }
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["g_loss"])

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            state, metrics = step(state, batch)
        float(metrics["g_loss"])

    summarize(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
