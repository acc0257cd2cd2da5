"""Device-mesh utilities: data-parallel scaling over ICI.

Reference parity: Caffe's optional multi-GPU data parallelism
(SURVEY.md §2b(ii) ``parallel.cpp``: P2P/NCCL gradient all-reduce,
root-solver broadcast). The TPU-native replacement is declarative: a 1-D
``jax.sharding.Mesh`` over the ``data`` axis, batch sharded / params
replicated via ``NamedSharding``, and XLA inserting the gradient ``psum``
over ICI inside the jitted train step — zero custom communication code
(SURVEY.md §5 "Distributed communication backend").
"""

from depthvo_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
