"""Training: config, model container, device merge loop, orchestration."""

from yabpe_tpu.train.config import BBPETrainerConfig
from yabpe_tpu.train.model import BBPEModel
from yabpe_tpu.train.trainer import BBPETrainer

__all__ = ["BBPETrainer", "BBPETrainerConfig", "BBPEModel"]
