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


def test_rendered_views_pair_dataset(tmp_path):
    import cv2

    from pope_tpu.data.scenes import RenderedViewsPairDataset
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(0)
    obj = tmp_path / "objA"
    obj.mkdir()
    for i in range(11):
        cv2.imwrite(str(obj / f"{i:03d}.png"), rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8))
        angle = np.deg2rad(i * 8.0)  # consecutive views 8 degrees apart
        Rm = Rotation.from_rotvec([0, angle, 0]).as_matrix()
        pose = np.hstack([Rm, [[0], [0], [1.0]]])
        np.save(str(obj / f"{i:03d}.npy"), pose)
    cls_file = tmp_path / "classes.txt"
    cls_file.write_text("objA\n")

    ds = RenderedViewsPairDataset(str(tmp_path), str(cls_file), seed=3)
    assert len(ds) == 1
    item = ds[0]
    assert item["image0"].shape == (1, 32, 32)
    assert item["T_0to1"].shape == (4, 4)
    # sampled pair obeys the rotation-bin cap (max 90 degrees)
    from pope_tpu.geometry.pose import rotation_angle_deg
    import jax.numpy as jnp

    r = float(rotation_angle_deg(jnp.asarray(np.eye(3), jnp.float32), jnp.asarray(item["T_0to1"][:3, :3])))
    assert r <= 90.0
