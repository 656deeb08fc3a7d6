from .frechet import frechet_distance, gaussian_stats
from .fid import fid_from_features, compute_features
from .coherence import coherence_accuracy, unconditional_coherence
from .metrics import samples_f1, binary_accuracy
