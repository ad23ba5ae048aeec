"""Multi-chip parallelism: mesh, DP sharding, spatial halo-exchange."""

from sequitr_tpu.parallel import spatial  # noqa: F401
from sequitr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_mesh2d,
    replicated,
    batch_sharded,
    shard_batch,
    make_dp_train_step,
    make_dp_frame_inferrer,
    make_dp_frame_mapper,
    make_dp_registerer,
    make_dp_localizer,
    make_dp_localizer3d,
    make_dp_localizer_astig,
    make_dp_deconvolver,
    make_dp_seam_correlator,
)


def __getattr__(name):
    # spatial_train pulls the full training stack (pipeline.train, optax)
    # into the process; serving-only workers must not pay that import at
    # startup, so the re-export is lazy (PEP 562)
    if name == "spatial_train":
        import importlib

        return importlib.import_module("sequitr_tpu.parallel.spatial_train")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
