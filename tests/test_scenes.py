"""Scene-sampler tests (host-side data module)."""

import numpy as np

from pope_tpu.data.scenes import ConcatDataset, RandomConcatSampler, get_local_split


class _FakeDS:
    def __init__(self, n, tag):
        self.n = n
        self.tag = tag

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return (self.tag, i)


def test_get_local_split_even():
    items = list(range(10))
    parts = [get_local_split(items, 4, r) for r in range(4)]
    assert all(len(p) == 3 for p in parts)
    covered = set(x for p in parts for x in p)
    assert covered == set(items)  # padding only repeats, never drops


def test_concat_and_sampler():
    concat = ConcatDataset([_FakeDS(10, "a"), _FakeDS(30, "b")])
    assert len(concat) == 40
    assert concat[5] == ("a", 5)
    assert concat[15] == ("b", 5)
    sampler = RandomConcatSampler(concat, n_samples_per_subset=8, seed=0)
    idx = list(sampler)
    assert len(idx) == 16
    # scene balance: 8 from each subset despite 3x size imbalance
    from_a = sum(1 for i in idx if i < 10)
    assert from_a == 8
    # without replacement on the small subset still yields 8 (padded)
    s2 = RandomConcatSampler(concat, 12, subset_replacement=False, seed=1)
    idx2 = list(s2)
    assert len(idx2) == 24
