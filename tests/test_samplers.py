"""Resumable sharded samplers (dinov2/dinov2/data/samplers.py:100-230
semantics): disjoint per-rank shards of a shared epoch permutation,
per-iteration reshuffle, O(1) whole-epoch skip, and exact mid-epoch resume
of the SSL batch stream."""

import itertools

import numpy as np
import pytest

from pope_tpu.data.samplers import (
    InfiniteSampler,
    SamplerState,
    ShardedInfiniteSampler,
)


def take(it, n):
    return list(itertools.islice(iter(it), n))


def test_shards_disjoint_and_cover():
    """One iteration across all ranks covers the dataset exactly once
    (modulo the sample_count % world remainder the reference also drops)."""
    n, world = 101, 4
    per = n // world  # 25
    shards = [
        take(ShardedInfiniteSampler(n, seed=3, start=r, step=world), per)
        for r in range(world)
    ]
    all_idx = [i for s in shards for i in s]
    assert len(set(all_idx)) == len(all_idx) == per * world  # disjoint
    assert set(all_idx) <= set(range(n))


def test_advance_reproduces_skipped_stream():
    """sampler(advance=k) == sampler(advance=0) minus its first k yields,
    including across an iteration boundary."""
    n, world, rank = 37, 2, 1
    per = n // world  # 18
    full = take(ShardedInfiniteSampler(n, seed=7, start=rank, step=world), 4 * per)
    for k in (0, 5, per, per + 3, 2 * per + 7):
        resumed = take(
            ShardedInfiniteSampler(n, seed=7, start=rank, step=world, advance=k),
            4 * per - k,
        )
        assert resumed == full[k:], f"advance={k}"


def test_iterations_reshuffle_same_set():
    """Each iteration is a fresh order over the SAME per-rank shard
    (per-iteration reseed, samplers.py:216-230)."""
    n = 64
    s = ShardedInfiniteSampler(n, seed=0, start=0, step=1)
    it1, it2 = take(s, n), take(iter(s), 2 * n)[n:]
    assert sorted(it1) == sorted(it2) == list(range(n))
    assert it1 != it2


def test_state_roundtrip():
    s = ShardedInfiniteSampler(50, seed=9, start=2, step=5, advance=11)
    st = s.state(consumed=4)
    assert st == SamplerState(sample_count=50, seed=9, start=2, step=5,
                              consumed=15, shuffle=True)
    full = take(ShardedInfiniteSampler(50, seed=9, start=2, step=5), 30)
    assert take(ShardedInfiniteSampler.from_state(st), 15) == full[15:]


def test_whole_epoch_skip_is_arithmetic():
    """A million-epoch advance must not materialize a permutation per
    skipped epoch — it resolves in O(per-epoch work)."""
    import time

    n = 1000
    k = 1_000_000 * n + 123
    t0 = time.perf_counter()
    first = take(ShardedInfiniteSampler(n, seed=1, advance=k), 5)
    assert time.perf_counter() - t0 < 1.0
    assert set(first) <= set(range(n))
    # and the arithmetic is exact: the advanced stream matches a reference
    # stream that walked the same number of iterations (iter_count=1e6,
    # intra-iteration offset 123), computed via the slice helper directly
    s = ShardedInfiniteSampler(n, seed=1)
    perm = np.random.default_rng(1).permutation(n)
    want = list(s._slice(perm, 1_000_000)[123 : 123 + 5])
    assert first == want


def test_unshuffled_stream_is_strided():
    s = ShardedInfiniteSampler(10, shuffle=False, seed=0, start=1, step=3)
    assert take(s, 6) == [1, 4, 7, 1, 4, 7]


def test_infinite_sampler_fresh_perm_per_iteration():
    n = 32
    s = InfiniteSampler(n, seed=4, start=0, step=1)
    a, b = take(s, n), take(iter(s), 2 * n)[n:]
    assert sorted(a) == sorted(b) == list(range(n))
    assert a != b


def test_validation():
    with pytest.raises(ValueError):
        ShardedInfiniteSampler(10, start=4, step=4)
    with pytest.raises(ValueError):
        ShardedInfiniteSampler(3, start=0, step=4)


# ---------------------------------------------------------------------------
# SSL batch-stream resume (the driver-level "kill and resume" contract)
# ---------------------------------------------------------------------------


def _tiny_image_dir(tmp_path, n=5):
    import cv2

    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(n):
        cv2.imwrite(str(d / f"{i}.png"),
                    rng.uniform(0, 255, (80, 96, 3)).astype(np.uint8))
    return d


def test_ssl_batches_resume_mid_epoch(tmp_path):
    """Kill-and-resume reproduces the unkilled batch stream EXACTLY
    (verdict r4 #7): restarting with advance_batches=k yields the same
    collated arrays as batches k.. of the uninterrupted stream — including
    augmentation crops, iBOT masks, and collate sampling, mid-epoch."""
    from pope_tpu.train.ssl import SSLConfig
    from pope_tpu.train.ssl_driver import make_ssl_batches

    cfg = SSLConfig(global_crop_size=56, local_crop_size=14, n_local_crops=2,
                    mask_ratio_min=0.4, mask_ratio_max=0.6,
                    mask_sample_probability=1.0)
    kw = dict(batch_size=2, seed=11, num_workers=1, rank=0, world=1)
    # 5 images, batch 2 => batches cross the epoch boundary at 2.5
    full = take(make_ssl_batches(str(_tiny_image_dir(tmp_path)), cfg, **kw), 6)
    resumed = take(
        make_ssl_batches(str(tmp_path / "imgs"), cfg, advance_batches=3, **kw), 3
    )
    for got, want in zip(resumed, full[3:]):
        assert set(got) == set(want)
        for k in got:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_ssl_batches_rank_shards_disjoint(tmp_path):
    """Sampler-level sharding: within one epoch window the two ranks'
    streams pull disjoint images (shared permutation, strided slices)."""
    from pope_tpu.train.ssl import SSLConfig
    from pope_tpu.train.ssl_driver import make_ssl_batches

    d = _tiny_image_dir(tmp_path, n=6)
    cfg = SSLConfig(global_crop_size=56, local_crop_size=14, n_local_crops=2,
                    mask_ratio_min=0.4, mask_ratio_max=0.6,
                    mask_sample_probability=1.0)
    b0 = next(make_ssl_batches(str(d), cfg, batch_size=3, seed=0,
                               num_workers=1, rank=0, world=2))
    b1 = next(make_ssl_batches(str(d), cfg, batch_size=3, seed=0,
                               num_workers=1, rank=1, world=2))
    assert not np.allclose(b0["global_crops"], b1["global_crops"])
    assert not np.array_equal(b0["masks"], b1["masks"])
