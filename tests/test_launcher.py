"""Pairwise job launcher sharding logic."""

from maskcyclegan_vc_tpu.cli.launch_pairwise import pair_jobs, shard_for_host


def test_pair_count_12_speakers():
    ids = [f"S{i}" for i in range(12)]
    jobs = pair_jobs(ids)
    assert len(jobs) == 66  # C(12, 2)
    assert len(set(jobs)) == 66


def test_host_shards_partition():
    ids = [f"S{i}" for i in range(12)]
    jobs = pair_jobs(ids)
    shards = [shard_for_host(jobs, h, 4) for h in range(4)]
    flat = [j for s in shards for j in s]
    assert sorted(flat) == sorted(jobs)
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1
