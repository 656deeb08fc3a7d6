from .mixture import MixtureMultimodalVAE, poe, powerset_masks, stratified_select
from .losses import (
    kl_standard,
    kl_between,
    sum_mse,
    total_rec_loss,
    total_kl_loss,
    mvae_loss,
    mvt_loss,
)
