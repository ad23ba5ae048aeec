"""Host-side data I/O: TIFF stacks, TFRecord-compatible shards, prefetch."""

from sequitr_tpu.data import tiff  # noqa: F401
from sequitr_tpu.data.source import FrameSource  # noqa: F401
from sequitr_tpu.data import records  # noqa: F401
from sequitr_tpu.data.prefetch import (  # noqa: F401
    prefetch_to_device,
    batch_iterator,
    ShardIterator,
)
