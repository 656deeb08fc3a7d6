from .mesh import (
    data_parallel_jit,
    dp_shardings,
    adapt_pallas_for_mesh,
    demote_pallas_for_mesh,
    make_mesh,
    mesh_from_flag,
    put_batch,
    replicate,
    replicate_tree,
    shard_batch,
)
from .fleet import VAEFleet
