"""Hand-written Pallas TPU kernels for the dense-processing hot paths.

Kernels fall back to interpreter mode off-TPU (CI runs them interpreted on
the CPU backend; SURVEY.md §4).
"""

from sequitr_tpu.ops.pallas.histogram import (  # noqa: F401
    histogram_2d,
    pallas_quantiles,
)
