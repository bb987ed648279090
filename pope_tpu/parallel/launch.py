"""Multi-host launch: the TPU-pod equivalent of the reference's SLURM/submitit
launchers and torch-distributed env bootstrap (dinov2/run/submit.py:1-122,
dinov2/distributed/__init__.py:152-263, scripts/train_dinov2_pose.py:25-29).

The torch recipe needs a master address/port rendezvous, per-process GPU
pinning and a process-group backend. On a TPU pod none of that exists: every
host runs the same program, `jax.distributed.initialize()` discovers the pod
topology from the TPU metadata server, and ONE `jax.sharding.Mesh` spans all
chips with XLA inserting collectives over ICI/DCN. What remains worth keeping
from the reference is the *bootstrap ladder* — explicit args > preset env >
SLURM allocation > local fallback — because TPU slices are themselves often
SLURM- or batch-scheduled. This module resolves that ladder, initializes the
JAX distributed runtime, and hands the entry function a global mesh with
main-process-gated logging.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import re
from typing import Callable, Mapping, Optional, Sequence

# SLURM's compact nodelist syntax: "tpu-[001-003,007],login1" — expanded
# below without any scheduler dependency (the reference leans on submitit).
_NODELIST_GROUP = re.compile(r"([^,\[]+)(?:\[([^\]]+)\])?")


def parse_slurm_nodelist(nodelist: str) -> list[str]:
    """Expand a SLURM compact nodelist into hostnames.

    Handles prefix[a-b,c] ranges with zero padding and plain comma-joined
    names (dinov2/distributed/__init__.py _parse_slurm_node_list semantics).
    """
    hosts: list[str] = []
    pos = 0
    while pos < len(nodelist):
        m = _NODELIST_GROUP.match(nodelist, pos)
        if not m:
            raise ValueError(f"unparseable SLURM nodelist at {nodelist[pos:]!r}")
        prefix, body = m.group(1), m.group(2)
        if body is None:
            hosts.append(prefix)
        else:
            for part in body.split(","):
                if "-" in part:
                    lo, hi = part.split("-")
                    width = len(lo)
                    for i in range(int(lo), int(hi) + 1):
                        hosts.append(f"{prefix}{i:0{width}d}")
                else:
                    hosts.append(f"{prefix}{part}")
        pos = m.end()
        if pos < len(nodelist):
            if nodelist[pos] != ",":
                raise ValueError(f"unparseable SLURM nodelist at {nodelist[pos:]!r}")
            pos += 1
    return hosts


def _slurm_port(job_id: int) -> int:
    # deterministic per-job port in the dynamic range so every process picks
    # the same coordinator port without a rendezvous file
    return 20000 + job_id % 20000


_PRESET_VARS = ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID")


@dataclasses.dataclass(frozen=True)
class DistributedEnv:
    """Resolved process topology for jax.distributed.initialize."""

    coordinator_address: Optional[str]  # "host:port"; None => auto-detect
    num_processes: Optional[int]  # None => auto-detect (TPU metadata)
    process_id: Optional[int]
    source: str  # 'explicit' | 'preset-env' | 'slurm' | 'local'

    @property
    def is_multiprocess(self) -> bool:
        return (self.num_processes or 1) > 1


def resolve_env(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    environ: Optional[Mapping[str, str]] = None,
) -> DistributedEnv:
    """Bootstrap ladder: explicit args > POPE_*/JAX preset env > SLURM > local.

    Mirrors _TorchDistributedEnvironment's resolution order but produces the
    three values jax.distributed.initialize actually needs; a partially-set
    preset environment is an error (same contract as the reference).
    """
    env = os.environ if environ is None else environ
    if coordinator is None and num_processes == 1 and process_id in (None, 0):
        # a fully single-process explicit spec is just a local run: don't
        # spin up the distributed runtime for `--num-processes 1`
        return DistributedEnv(None, None, None, "local")
    if coordinator is not None or num_processes is not None or process_id is not None:
        # hold explicit args to the same contract as the preset env: any
        # multi-process intent (num_processes > 1 OR a process_id) needs all
        # three values, and failing here beats an opaque error deep inside
        # jax.distributed.initialize. A lone coordinator stays legal (jax
        # auto-detects the rest from TPU metadata).
        if ((num_processes or 1) > 1 or process_id is not None) and (
            coordinator is None or num_processes is None or process_id is None
        ):
            missing = [
                name
                for name, val in (
                    ("coordinator", coordinator),
                    ("num_processes", num_processes),
                    ("process_id", process_id),
                )
                if val is None
            ]
            raise RuntimeError(
                f"partially specified explicit distributed topology; missing {missing}"
            )
        return DistributedEnv(coordinator, num_processes, process_id, "explicit")

    preset = {v: env[f"POPE_{v}"] for v in _PRESET_VARS if f"POPE_{v}" in env}
    if preset:
        if len(preset) != len(_PRESET_VARS):
            missing = [v for v in _PRESET_VARS if v not in preset]
            raise RuntimeError(
                f"partially set POPE_* distributed environment; missing {missing}"
            )
        return DistributedEnv(
            preset["COORDINATOR_ADDRESS"],
            int(preset["NUM_PROCESSES"]),
            int(preset["PROCESS_ID"]),
            "preset-env",
        )

    if "SLURM_JOB_ID" in env and "SLURM_NTASKS" in env:
        ntasks = int(env["SLURM_NTASKS"])
        if ntasks > 1:
            nodes = parse_slurm_nodelist(env["SLURM_JOB_NODELIST"])
            port = _slurm_port(int(env["SLURM_JOB_ID"]))
            return DistributedEnv(
                f"{nodes[0]}:{port}",
                ntasks,
                int(env["SLURM_PROCID"]),
                "slurm",
            )

    return DistributedEnv(None, None, None, "local")


def initialize(env: Optional[DistributedEnv] = None) -> DistributedEnv:
    """Bring up the JAX distributed runtime for the resolved topology.

    Local single-process resolution is a no-op (jax works standalone); on a
    bare Cloud-TPU pod with no scheduler env, callers pass
    DistributedEnv(None, None, None, 'auto') semantics by exporting
    POPE_* vars or relying on jax's own TPU metadata auto-detection via
    initialize() with all-None arguments.
    """
    import jax

    env = env or resolve_env()
    if env.source == "local":
        return env
    kwargs = {}
    if env.coordinator_address is not None:
        kwargs["coordinator_address"] = env.coordinator_address
    if env.num_processes is not None:
        kwargs["num_processes"] = env.num_processes
    if env.process_id is not None:
        kwargs["process_id"] = env.process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialized (idempotent launch)
        if "already initialized" not in str(e):
            raise
    return env


def launch(
    fn: Callable,
    *,
    env: Optional[DistributedEnv] = None,
    tp: Optional[int] = None,
    argv: Sequence = (),
    log_level: int = logging.INFO,
):
    """Run `fn(mesh, *argv)` under the global device mesh.

    The multi-host contract (replaces dinov2's submitit Trainer.__call__):
    every host calls launch() with the same code; the mesh spans all
    processes' devices; only process 0 logs at `log_level` (others at
    WARNING); a cross-host barrier runs before returning so no host exits
    while peers still hold collectives in flight.
    """
    import jax

    from pope_tpu.parallel.mesh import make_mesh

    env = initialize(env)
    root = logging.getLogger()
    if jax.process_index() != 0:
        root.setLevel(max(root.level, logging.WARNING))
    else:
        root.setLevel(min(root.level or log_level, log_level))
    mesh = make_mesh(tp=tp) if tp else make_mesh()
    try:
        return fn(mesh, *argv)
    finally:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("pope_launch_exit")
