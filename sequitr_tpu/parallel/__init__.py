"""Multi-chip parallelism: mesh, DP sharding, spatial halo-exchange."""

from sequitr_tpu.parallel import spatial  # noqa: F401
from sequitr_tpu.parallel import spatial_train  # noqa: F401
from sequitr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_mesh2d,
    replicated,
    batch_sharded,
    shard_batch,
    make_dp_train_step,
    make_dp_frame_inferrer,
    make_dp_frame_mapper,
)
