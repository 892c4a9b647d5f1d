"""Bucket sampler tests: bucketing rules, padding-by-repeat, rank striding,
epoch determinism (reference semantics: datas/sampler.py:4-132)."""

import numpy as np

from stabletts_tpu.data.sampler import DistributedBucketSampler


def test_bucket_assignment_and_drops():
    lengths = [10, 32, 33, 100, 300, 301, 999, 1000, 1001]
    s = DistributedBucketSampler(lengths, batch_size=1, boundaries=[32, 300, 1000])
    flat = [i for b in s.buckets for i in b]
    # dropped: 10 and 32 (<= 32), 1001 (> 1000)
    assert 0 not in flat and 1 not in flat and 8 not in flat
    # bucket 0: (32, 300], bucket 1: (300, 1000]
    assert set(s.buckets[0]) == {2, 3, 4}
    assert set(s.buckets[1]) == {5, 6, 7}


def test_pad_to_multiple_and_rank_stride():
    lengths = [100] * 10  # one bucket of 10
    world, bs = 4, 2
    samplers = [
        DistributedBucketSampler(lengths, bs, [32, 300], num_replicas=world, rank=r)
        for r in range(world)
    ]
    # 10 padded to multiple of world*bs=8 -> 16; 4 per rank -> 2 batches each
    for s in samplers:
        batches = list(s)
        assert len(batches) == 2
        for _, idx in batches:
            assert len(idx) == bs
    # all ranks together cover every index at least once
    covered = set()
    for s in samplers:
        for _, idx in s:
            covered.update(idx)
    assert covered == set(range(10))


def test_epoch_determinism_and_shuffling():
    lengths = list(np.random.default_rng(0).integers(33, 1000, size=50))
    s1 = DistributedBucketSampler(lengths, 4, [32, 300, 600, 1000])
    s2 = DistributedBucketSampler(lengths, 4, [32, 300, 600, 1000])
    s1.set_epoch(3)
    s2.set_epoch(3)
    assert list(s1) == list(s2)
    s2.set_epoch(4)
    assert list(s1) != list(s2)


def test_empty_bucket_fallback():
    # only short utterances: upper buckets must be dropped without error
    lengths = [50, 60, 70, 80]
    s = DistributedBucketSampler(lengths, 2, [32, 300, 600, 1000])
    assert len(s.buckets) == 1
    batches = list(s)
    assert all(b == 0 for b, _ in batches)


def test_batch_carries_bucket_pad_length():
    lengths = [100, 100, 500, 500]
    s = DistributedBucketSampler(lengths, 2, [32, 300, 1000])
    for bucket, idx in s:
        pad = s.bucket_mel_len(bucket)
        assert pad in (300, 1000)
        for i in idx:
            assert lengths[i] <= pad
