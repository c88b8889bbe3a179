from clip_glass_tpu.training import losses  # noqa: F401
from clip_glass_tpu.training.trainer import Trainer, TrainerConfig, TrainState  # noqa: F401
