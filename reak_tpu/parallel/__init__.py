"""Device-mesh scaling: scenario-batch sharding + collectives.

The reference has no parallelism framework (SURVEY.md §2.24) — throughput comes
from serial Monte-Carlo loops.  Here the scaling axis is the *scenario batch*
(MPC scenarios, EKF Monte-Carlo runs, planner edge propagations), sharded over
a ``jax.sharding.Mesh`` with ``shard_map``; summary reductions ride ICI via
``psum``.  Sequence/pipeline/expert parallelism are N/A for this domain (no
sequence workload — documented rather than invented).
"""
from reak_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    sharded_map,
    pmean_scalar,
    distribute_init,
)

__all__ = ["make_mesh", "shard_batch", "sharded_map", "pmean_scalar", "distribute_init"]
