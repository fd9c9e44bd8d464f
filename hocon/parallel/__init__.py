"""Parallelism layer — re-exports the device-mesh / sharding utilities.

The reference is single-process (SURVEY.md §2.3); this framework's
parallelism is pure data parallelism over a 1-D ``data`` mesh (params
replicated, batch sharded, gradient psum over ICI inserted by XLA).
Implementation lives in ``hocon.train.sharding``; this package provides the
conventional import location.
"""

from hocon.train.sharding import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
