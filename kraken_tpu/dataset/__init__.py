from kraken_tpu.dataset.transforms import ImageInputTransforms
from kraken_tpu.dataset.utils import collate_sequences, global_align, compute_confusions

__all__ = ['ImageInputTransforms', 'collate_sequences', 'global_align',
           'compute_confusions']
