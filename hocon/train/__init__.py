"""Training layer (reference L5: meshreg/netscripts/) + parallelism.

The reference is single-process/single-GPU; here data parallelism is
first-class (SURVEY.md §2.3): a 1-D ``data`` device mesh, batch sharded
over it, parameters replicated, gradients psum'd by XLA over ICI.
"""

from hocon.train.sharding import make_mesh, shard_batch, replicate
from hocon.train.state import TrainState, create_train_state
from hocon.train.steps import make_eval_step, make_train_step, make_warp_train_step
