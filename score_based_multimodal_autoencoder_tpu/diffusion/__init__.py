from .sde import SDE, VPSDE, SubVPSDE, VESDE, get_sde
from .losses import dsm_loss, sample_importance_weighted_time
from .samplers import (
    em_predictor_step,
    langevin_corrector_step,
    unconditional_sampler,
    conditional_sampler,
)
