"""
Compatibility re-export: the reference exposes exceptions under
kraken.lib.exceptions; kraken_tpu keeps them top-level but mirrors the path.
"""
from kraken_tpu.exceptions import *  # noqa: F401,F403
from kraken_tpu.exceptions import __all__  # noqa: F401
