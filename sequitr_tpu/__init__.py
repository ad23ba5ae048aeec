"""sequitr_tpu — TPU-native microscopy image-processing framework.

A from-scratch rebuild of the capabilities of quantumjot/sequitr
(TensorFlow-1.x GPU image server for cell segmentation / enhancement /
localization) designed TPU-first on jax/XLA/Pallas:

- 2D/3D U-Net segmentation and pix2pix-style GAN enhancement
  (``sequitr_tpu.models``)
- dense pre/post-processing — percentile normalization, overlapping-patch
  tiling, weighted stitch-blend, on-device augmentation
  (``sequitr_tpu.ops``)
- fused single-jit-graph tiled inference and training drivers
  (``sequitr_tpu.pipeline``)
- data-parallel sharding over a TPU mesh (``sequitr_tpu.parallel``)
- TIFF / record I/O with double-buffered host->HBM streaming
  (``sequitr_tpu.data``)
- object localization export for btrack (``sequitr_tpu.localize``)
- sequitr-compatible filesystem job API (``sequitr_tpu.server``)

Provenance: the reference mount ``/root/reference`` was empty at build time
(see SURVEY.md provenance warning); behavior is built to the capability spec
in SURVEY.md / BASELINE.json, with every reference-behavior assumption
documented as a spec decision in the relevant docstring.
"""

__version__ = "0.1.0"

from sequitr_tpu import ops  # noqa: F401
from sequitr_tpu import models  # noqa: F401

_LAZY = (
    "data", "pipeline", "parallel", "server", "client", "localize",
    "psf", "utils", "native", "config",
)

__all__ = ["ops", "models", "__version__", *_LAZY]


def __getattr__(name):
    # lazy subpackage access: `sequitr_tpu.pipeline` etc. import on first
    # touch so `import sequitr_tpu` stays light (optax/orbax/h5py deferred)
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(f"sequitr_tpu.{name}")
        globals()[name] = mod
        return mod
    raise AttributeError(f"module 'sequitr_tpu' has no attribute {name!r}")
