"""Dense pre/post-processing ops (TPU-first, jit-safe).

- ``normalize``: percentile intensity normalization (exact + histogram fast path)
- ``tiling``: overlapping-patch extraction and weighted stitch-blend
- ``augment``: on-device flip/rot/elastic augmentation
- ``losses``: weighted softmax CE, GAN losses, IoU/Dice metrics
- ``weightmaps``: host-side Ronneberger weight-map precompute
- ``registration``: FFT phase-correlation drift correction
- ``illumination``: retrospective flat-field + photobleach compensation
- ``colocalize``: per-object Pearson/Manders colocalization (host-side)
- ``qc``: per-frame acquisition QC (focus/exposure/saturation, on-device)
- ``projection``: z-projection of volumes (max/mean/..., best-focus, EDoF)
- ``flows``: flow-field instance segmentation (diffusion targets, flow
  following, sink grouping, instance AP)
- ``pallas``: hand-written Pallas TPU kernels for the hot paths
"""

from sequitr_tpu.ops.normalize import (  # noqa: F401
    percentile_normalize,
    percentile_normalize_fast,
    histogram_quantiles,
)
from sequitr_tpu.ops.tiling import (  # noqa: F401
    tile_offsets,
    tile_grid,
    blend_window,
    extract_patches,
    extract_patches_scan,
    stitch_patches,
    stitch_patches_scan,
)
from sequitr_tpu.ops.losses import (  # noqa: F401
    weighted_softmax_cross_entropy,
    softmax_label_map,
    sigmoid_bce_with_logits,
    gan_discriminator_loss,
    gan_generator_loss,
    l1_loss,
    iou,
    dice,
)
from sequitr_tpu.ops.augment import (  # noqa: F401
    random_flip,
    random_rot90,
    elastic_fields,
    elastic_warp,
    photometric_jitter,
    augment_example,
)
from sequitr_tpu.ops.registration import (  # noqa: F401
    phase_correlate,
    apply_shift,
    register_step,
    common_crop,
)
from sequitr_tpu.ops import weightmaps  # noqa: F401
from sequitr_tpu.ops import colocalize  # noqa: F401
from sequitr_tpu.ops import qc  # noqa: F401
from sequitr_tpu.ops import projection  # noqa: F401
from sequitr_tpu.ops import flows  # noqa: F401
