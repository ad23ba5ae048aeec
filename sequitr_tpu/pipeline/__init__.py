"""Train/infer drivers: fused tiled inference, U-Net & GAN training."""

from sequitr_tpu.pipeline.infer import (  # noqa: F401
    TileConfig,
    make_frame_inferrer,
    infer_stack,
)
from sequitr_tpu.pipeline.train import (  # noqa: F401
    TrainConfig,
    TrainState,
    create_unet_state,
    make_unet_train_step,
    GANTrainState,
    create_gan_state,
    make_gan_train_step,
    save_checkpoint,
    restore_checkpoint,
)
