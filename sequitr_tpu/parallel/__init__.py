"""Multi-chip parallelism: mesh construction, DP sharding helpers."""

from sequitr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicated,
    batch_sharded,
    shard_batch,
    make_dp_train_step,
    make_dp_frame_inferrer,
)
