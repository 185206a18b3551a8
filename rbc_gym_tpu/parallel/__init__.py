"""Multi-chip scale-out via jax.sharding (SPMD over a device mesh).

The reference's entire distributed story is N OS processes with embedded
Julia runtimes piped through Python multiprocessing (SURVEY §2.7/§5.8).
Here scale-out is a sharding annotation: env-batched field arrays are
sharded over the mesh's env axes, params stay replicated, and XLA inserts
the (ICI-riding) collectives — psum for gradient reduction in the PPO
update, nothing at all for the embarrassingly parallel env stepping.
"""

from rbc_gym_tpu.parallel.mesh import (
    make_env_mesh,
    shard_batch,
    replicate,
    shard_vector_env,
)
from rbc_gym_tpu.parallel.distributed import (
    initialize_distributed,
    make_host_env_mesh,
    shard_ppo_trainer,
    host_local_slice,
)

__all__ = [
    "make_env_mesh",
    "shard_batch",
    "replicate",
    "shard_vector_env",
    "initialize_distributed",
    "make_host_env_mesh",
    "shard_ppo_trainer",
    "host_local_slice",
]
