"""The canonical reference training config as ONE shared setup.

Batch 1, 64-frame crops, max_mask_len 25, 81-step epochs, 6172 epochs —
exactly what the reference trains
(/root/reference/bash_scripts/mask_cyclegan_train.sh:13-19). Used by
bench.py (the ``batch1_scan_ms_per_it`` metric) and by
benchmarks/profile_step.py --scan so the profiler always attributes the
same program the benchmark reports.
"""

STEPS_PER_EPOCH = 81
NUM_FRAMES = 64
MAX_MASK_LEN = 25


def canonical_batch1_setup(dtype, fused_norms: bool, seed: int = 0):
    """Returns (state, bank, epoch_fn) for the canonical config.

    ``epoch_fn(state, bank, bank, key) -> (state, stacked_metrics)`` runs
    one 81-step epoch as a single device program.
    """
    import numpy as np

    from maskcyclegan_vc_tpu.data.dataset import MelBank
    from maskcyclegan_vc_tpu.train.schedules import ScheduleConfig
    from maskcyclegan_vc_tpu.train.state import TrainConfig, create_train_state
    from maskcyclegan_vc_tpu.train.step import make_scan_epoch

    cfg = TrainConfig(
        schedule=ScheduleConfig(
            num_epochs=6172, n_samples=STEPS_PER_EPOCH, batch_size=1,
            decay_after=200_000, stop_identity_after=10_000),
        num_frames=NUM_FRAMES,
        dtype=dtype,
        fused_norms=fused_norms,
    )
    state = create_train_state(cfg, seed=seed)
    rs = np.random.RandomState(seed)
    bank = MelBank.from_list(
        [rs.randn(80, 200).astype(np.float32)
         for _ in range(STEPS_PER_EPOCH)])
    epoch_fn = make_scan_epoch(cfg, True, STEPS_PER_EPOCH, 1, NUM_FRAMES,
                               MAX_MASK_LEN)
    return state, bank, epoch_fn
