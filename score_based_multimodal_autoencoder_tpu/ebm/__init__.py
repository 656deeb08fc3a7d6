from .coherence_ebm import PairwiseCoherenceEBM
from .nce import nce_loss, perturb_vp, make_ebm_train_step
from .guidance import make_pairwise_guidance
