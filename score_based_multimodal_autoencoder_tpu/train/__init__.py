from .state import TrainState, create_train_state
from .ema import ema_update
from .steps import (
    make_vae_train_step,
    make_vae_eval_step,
    make_score_train_step,
    make_latent_encoder,
)
from .checkpoints import CheckpointManager
