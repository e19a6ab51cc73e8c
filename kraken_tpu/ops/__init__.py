from kraken_tpu.ops import ctc

__all__ = ['ctc']
