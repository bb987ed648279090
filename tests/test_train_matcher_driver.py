"""Matcher training driver tests (scripts/train.py:57-123 +
lightning_loftr.py:60-203 equivalent): multi-scene run descends, validation
emits the auc@{5,10,20} monitors, checkpoints are top-k-monitored on auc@10
and training resumes from `last` mid-schedule; dp=8 CPU-mesh run works."""

import json
import os

import numpy as np
import pytest
import jax

from pope_tpu.train import TopKCheckpointer, TrainMatcherConfig, train_matcher
from pope_tpu.train.matcher_driver import collate_pairs
from pope_tpu.train.trainer import MatcherTrainState

from tests.test_train import _tiny_matcher


class SynthScene:
    """In-memory scene dataset: fronto-parallel plane at depth 2 under a pure
    x-translation (exactly computable warps, same geometry as
    test_train._synth_batch) with per-item random textures."""

    def __init__(self, seed: int, n: int = 16, H: int = 64, W: int = 64):
        self.rng = np.random.default_rng(seed)
        self.n, self.H, self.W = n, H, W
        self.items = [self._make(i) for i in range(n)]

    def _make(self, i):
        H, W = self.H, self.W
        K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.2
        return {
            "image0": self.rng.uniform(0, 1, (1, H, W)).astype(np.float32),
            "image1": self.rng.uniform(0, 1, (1, H, W)).astype(np.float32),
            "depth0": np.full((H, W), 2.0, np.float32),
            "depth1": np.full((H, W), 2.0, np.float32),
            "T_0to1": T,
            "T_1to0": np.linalg.inv(T).astype(np.float32),
            "K0": K,
            "K1": K,
            "pair_name": f"scene{self.rng.integers(1e6)}/{i}",
        }

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.items[i]


def _fast_cfg(**kw):
    kw.setdefault("epochs", 2)
    kw.setdefault("n_samples_per_subset", 8)
    kw.setdefault("warmup_steps", 0)
    kw.setdefault("canonical_bs", 4)  # scaling=1 at batch 4
    kw.setdefault("canonical_lr", 2e-3)
    kw.setdefault("val_n_hyps", 64)
    kw.setdefault("val_n_rounds", 1)
    kw.setdefault("save_top_k", 2)
    return TrainMatcherConfig(**kw)


def test_collate_pairs_layout():
    ds = SynthScene(0, n=3)
    batch = collate_pairs([ds[0], ds[1]])
    assert batch["image0"].shape == (2, 64, 64, 1)
    assert batch["depth1"].shape == (2, 64, 64)
    assert batch["T_0to1"].shape == (2, 4, 4) and batch["K1"].shape == (2, 3, 3)


@pytest.mark.slow
def test_train_matcher_descends_and_checkpoints(tmp_path):
    """Two scenes, two epochs: loss descends, every epoch logs the val
    monitors, and the checkpoint dir holds last + index + a best ckpt."""
    matcher = _tiny_matcher()
    train_ds = [SynthScene(1, n=8), SynthScene(2, n=8)]
    val_ds = SynthScene(3, n=3)  # odd size exercises the ragged val tail
    ckpt_dir = str(tmp_path / "ckpt")

    state, history = train_matcher(
        matcher, train_ds, val_ds, _fast_cfg(), batch_size=4,
        ckpt_dir=ckpt_dir, log_every=100,
    )
    assert [h["epoch"] for h in history] == [0, 1]
    losses = [h["train_loss"] for h in history]
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses
    for h in history:
        for k in ("auc@5", "auc@10", "auc@20", "R:auc@10", "prec@5e-04"):
            assert k in h and np.isfinite(h[k]), (k, h)

    assert os.path.isdir(os.path.join(ckpt_dir, "last"))
    with open(os.path.join(ckpt_dir, "index.json")) as f:
        index = json.load(f)
    assert index["epoch"] == 2 and index["monitor"] == "auc@10"
    assert len(index["best"]) >= 1
    for b in index["best"]:
        assert os.path.isdir(os.path.join(ckpt_dir, b["name"]))
        assert b["name"].startswith(f"epoch={b['epoch']}-auc5=")

    # resume: extending to 3 epochs continues from epoch 2, not epoch 0
    state2, history2 = train_matcher(
        matcher, train_ds, val_ds, _fast_cfg(epochs=3), batch_size=4,
        ckpt_dir=ckpt_dir, resume=True, log_every=100,
    )
    assert [h["epoch"] for h in history2] == [2]
    with open(os.path.join(ckpt_dir, "index.json")) as f:
        assert json.load(f)["epoch"] == 3


def test_topk_checkpointer_eviction(tmp_path):
    """save_top_k=2 mode=max on auc@10: keeps the two best, always refreshes
    `last` (scripts/train.py:94-97 ModelCheckpoint semantics)."""
    ckpt = TopKCheckpointer(str(tmp_path), monitor="auc@10", top_k=2)
    state = MatcherTrainState(
        step=jax.numpy.zeros((), jax.numpy.int32), params={"w": np.zeros(2)},
        batch_stats={}, opt_state={},
    )
    scores = [0.3, 0.5, 0.1, 0.7]
    for e, s in enumerate(scores):
        ckpt.save(state, e, {"auc@5": s, "auc@10": s, "auc@20": s})
    assert ckpt.best_score == 0.7 and ckpt.start_epoch == 4
    kept = sorted(b["score"] for b in ckpt.index["best"])
    assert kept == [0.5, 0.7]
    names = {b["name"] for b in ckpt.index["best"]}
    on_disk = {d for d in os.listdir(tmp_path) if d.startswith("epoch=")}
    assert on_disk == names  # evicted ckpts deleted

    # resume re-running an epoch whose NAME is already indexed but whose new
    # score no longer qualifies: the stale directory must go too, keeping
    # index.json and the on-disk set in sync
    ckpt.save(state, 1, {"auc@5": 0.5, "auc@10": 0.5, "auc@20": 0.5})  # requalifies
    assert sorted(b["score"] for b in ckpt.index["best"]) == [0.5, 0.7]
    ckpt2 = TopKCheckpointer(str(tmp_path), monitor="auc@10", top_k=1)
    ckpt2.save(state, 1, {"auc@5": 0.5, "auc@10": 0.5, "auc@20": 0.5})  # k=1: loses to 0.7
    names = {b["name"] for b in ckpt2.index["best"]}
    on_disk = {d for d in os.listdir(tmp_path) if d.startswith("epoch=")}
    assert on_disk == names == {"epoch=3-auc5=0.700-auc10=0.700-auc20=0.700"}


@pytest.mark.slow
def test_train_matcher_dp8_mesh(tmp_path):
    """The same driver over a dp=8 CPU mesh: one short epoch runs, produces
    finite losses and val metrics (SPMD replaces the reference's DDP)."""
    from pope_tpu.parallel import make_mesh

    matcher = _tiny_matcher()
    mesh = make_mesh(8)
    cfg = _fast_cfg(epochs=1, n_samples_per_subset=8, canonical_bs=8)
    state, history = train_matcher(
        matcher, [SynthScene(4, n=16)], SynthScene(5, n=8), cfg,
        batch_size=8, mesh=mesh, log_every=100,
    )
    assert len(history) == 1
    assert np.isfinite(history[0]["train_loss"])
    assert np.isfinite(history[0]["auc@10"])
