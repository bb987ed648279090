"""Device-mesh parallelism: mesh construction and sharding rules.

The reference's distribution surface (NCCL DDP in vestigial trainers,
ad-hoc 2-GPU model placement, SURVEY.md §2.5) maps here to a single
jax.sharding.Mesh with named axes and NamedSharding annotations; XLA inserts
the collectives over ICI.
"""

from pope_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_params_tp,
    replicate,
)
from pope_tpu.parallel.launch import (
    DistributedEnv,
    launch,
    resolve_env,
)
from pope_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_loss_and_grad,
    shard_stage_params,
    stack_stage_params,
)
