"""Command-line surface (the reference's shell-script + argparse layer).

Importing any CLI module enables the persistent XLA compilation cache:
every CLI process after the first reuses previously-compiled executables
(the whole-trajectory sampler scans are expensive to compile, especially
over a tunneled TPU link - see utils/cache.py). Opt out with
``SBMAE_NO_COMPILATION_CACHE=1``.
"""

from ..utils.cache import enable_compilation_cache

enable_compilation_cache()
