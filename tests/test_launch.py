"""Multi-host launch bootstrap (parallel/launch.py): the resolution ladder of
dinov2/distributed/__init__.py:152-263 recast for TPU pods, plus the
launch() mesh/logging contract (single-process here; the multi-process path
is jax.distributed.initialize, which needs real peers)."""

import logging

import pytest

from pope_tpu.parallel.launch import (
    DistributedEnv,
    launch,
    parse_slurm_nodelist,
    resolve_env,
)


def test_parse_nodelist_plain_and_ranges():
    assert parse_slurm_nodelist("tpuhost") == ["tpuhost"]
    assert parse_slurm_nodelist("a,b,c") == ["a", "b", "c"]
    assert parse_slurm_nodelist("tpu-[001-003]") == [
        "tpu-001", "tpu-002", "tpu-003",
    ]
    assert parse_slurm_nodelist("tpu-[001-002,007],login1") == [
        "tpu-001", "tpu-002", "tpu-007", "login1",
    ]


def test_resolve_explicit_wins_over_env():
    env = resolve_env(
        coordinator="10.0.0.1:1234", num_processes=4, process_id=2,
        environ={"POPE_COORDINATOR_ADDRESS": "ignored:1", "SLURM_JOB_ID": "7"},
    )
    assert env.source == "explicit"
    assert env.coordinator_address == "10.0.0.1:1234"
    assert env.num_processes == 4 and env.process_id == 2
    assert env.is_multiprocess


def test_resolve_preset_env():
    env = resolve_env(environ={
        "POPE_COORDINATOR_ADDRESS": "head:2222",
        "POPE_NUM_PROCESSES": "8",
        "POPE_PROCESS_ID": "3",
    })
    assert env.source == "preset-env"
    assert env.coordinator_address == "head:2222"
    assert env.num_processes == 8 and env.process_id == 3


def test_resolve_partial_preset_env_raises():
    with pytest.raises(RuntimeError, match="partially set"):
        resolve_env(environ={"POPE_COORDINATOR_ADDRESS": "head:2222"})


def test_resolve_slurm_allocation():
    env = resolve_env(environ={
        "SLURM_JOB_ID": "90210",
        "SLURM_NTASKS": "4",
        "SLURM_PROCID": "1",
        "SLURM_JOB_NODELIST": "tpu-[001-004]",
    })
    assert env.source == "slurm"
    host, port = env.coordinator_address.rsplit(":", 1)
    assert host == "tpu-001"
    assert 20000 <= int(port) < 40000
    assert env.num_processes == 4 and env.process_id == 1
    # every rank derives the identical coordinator
    env2 = resolve_env(environ={
        "SLURM_JOB_ID": "90210", "SLURM_NTASKS": "4", "SLURM_PROCID": "3",
        "SLURM_JOB_NODELIST": "tpu-[001-004]",
    })
    assert env2.coordinator_address == env.coordinator_address


def test_resolve_single_task_slurm_falls_back_local():
    env = resolve_env(environ={
        "SLURM_JOB_ID": "1", "SLURM_NTASKS": "1", "SLURM_PROCID": "0",
        "SLURM_JOB_NODELIST": "solo",
    })
    assert env.source == "local"
    assert not env.is_multiprocess


def test_ssl_batches_shard_per_rank(tmp_path):
    """Multi-host SSL data: ranks stream disjoint file shards and
    decorrelated augmentation/mask streams (the torch DistributedSampler +
    per-worker-seed contract, dinov2/data/loaders.py)."""
    import cv2
    import numpy as np

    from pope_tpu.data.scenes import get_local_split
    from pope_tpu.train.ssl import SSLConfig
    from pope_tpu.train.ssl_driver import make_ssl_batches

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    files = []
    for i in range(6):
        p = str(img_dir / f"{i}.png")
        cv2.imwrite(p, rng.uniform(0, 255, (80, 96, 3)).astype(np.uint8))
        files.append(p)

    # the split itself: disjoint and covering
    s0 = set(get_local_split(sorted(files), 2, 0, seed=5))
    s1 = set(get_local_split(sorted(files), 2, 1, seed=5))
    assert s0.isdisjoint(s1)
    assert s0 | s1 == set(files)

    cfg = SSLConfig(global_crop_size=56, local_crop_size=14, n_local_crops=2,
                    mask_ratio_min=0.4, mask_ratio_max=0.6,
                    mask_sample_probability=1.0)
    b0 = next(make_ssl_batches(str(img_dir), cfg, batch_size=3, seed=0,
                               num_workers=1, rank=0, world=2))
    b1 = next(make_ssl_batches(str(img_dir), cfg, batch_size=3, seed=0,
                               num_workers=1, rank=1, world=2))
    assert b0["global_crops"].shape == b1["global_crops"].shape
    assert not np.allclose(b0["global_crops"], b1["global_crops"])
    assert not np.array_equal(b0["masks"], b1["masks"])


def test_launch_runs_fn_under_global_mesh():
    seen = {}

    def entry(mesh, tag):
        seen["mesh"] = mesh
        seen["tag"] = tag
        return 42

    out = launch(entry, env=DistributedEnv(None, None, None, "local"),
                 argv=("hello",), log_level=logging.INFO)
    assert out == 42
    assert seen["tag"] == "hello"
    assert "dp" in seen["mesh"].axis_names
    assert seen["mesh"].devices.size >= 1


def test_resolve_partial_explicit_raises():
    """Any explicit multi-process intent with missing pieces fails HERE with
    a named-missing error, never deep inside jax.distributed.initialize."""
    import pytest

    from pope_tpu.parallel.launch import resolve_env

    for kwargs, missing in [
        (dict(num_processes=4, process_id=2), "coordinator"),
        (dict(coordinator="h:1", process_id=0), "num_processes"),
        (dict(process_id=2), "coordinator"),
        (dict(num_processes=4), "coordinator"),
    ]:
        with pytest.raises(RuntimeError, match=missing):
            resolve_env(environ={}, **kwargs)
    # a lone coordinator stays legal (jax TPU metadata auto-detect), as does
    # the fully-specified topology
    assert resolve_env(coordinator="h:1", environ={}).source == "explicit"
    env = resolve_env(coordinator="h:1", num_processes=4, process_id=2, environ={})
    assert env.num_processes == 4 and env.process_id == 2


def test_resolve_explicit_single_process_is_local():
    """`--num-processes 1` with no coordinator is a plain local run: it must
    NOT initialize the distributed runtime (initialize() no-ops on 'local')."""
    from pope_tpu.parallel.launch import resolve_env

    assert resolve_env(num_processes=1, environ={}).source == "local"
    assert resolve_env(num_processes=1, process_id=0, environ={}).source == "local"
    # but a coordinator makes it explicit again
    assert (
        resolve_env(coordinator="h:1", num_processes=1, process_id=0, environ={}).source
        == "explicit"
    )
