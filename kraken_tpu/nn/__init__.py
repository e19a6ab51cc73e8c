from kraken_tpu.nn.layers import (ActConv2D, Addition, Dropout, GroupNorm,
                                  Identity, LinSoftmax, MaxPool, Parallel,
                                  Reshape, Series, TransposedSummarizingRNN)

__all__ = ['ActConv2D', 'Addition', 'Dropout', 'GroupNorm', 'Identity',
           'LinSoftmax', 'MaxPool', 'Parallel', 'Reshape', 'Series',
           'TransposedSummarizingRNN']
