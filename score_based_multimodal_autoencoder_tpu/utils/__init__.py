from .cache import enable_compilation_cache
from .shaping import batch_mul, flatten_batch
from .rng import RngStream
