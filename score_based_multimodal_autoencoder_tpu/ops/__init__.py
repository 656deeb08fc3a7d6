from .group_norm import fused_group_norm_act
