"""Training harness: jitted train step, staged-variant loss graph,
optimizer, checkpointing, and the host loop.

Reference parity map (SURVEY.md §2b(ii), §3.1):
* Caffe ``Net::ForwardBackward`` + ``Solver::Step``  -> ``make_train_step``
  (one jitted XLA program: forward, backward, psum over the data mesh
  axis, optimizer update).
* ``solver.prototxt`` lr policy / SGD family        -> optax schedule+chain.
* ``Solver::Snapshot`` (.caffemodel/.solverstate)   -> orbax checkpoints of
  {params, batch_stats, opt_state, step} with weights-only init for the
  staged fine-tune recipe.
"""

from depthvo_tpu.train.state import TrainState, create_state  # noqa: F401
from depthvo_tpu.train.loop import (  # noqa: F401
    build_models,
    make_train_step,
    compute_losses,
    fit,
)
