from kraken_tpu.dataset.transforms import ImageInputTransforms
from kraken_tpu.dataset.utils import collate_sequences, global_align, compute_confusions
from kraken_tpu.dataset.recognition import (ArrowIPCRecognitionDataset,
                                            GroundTruthDataset, PolygonGTDataset)
from kraken_tpu.dataset.segmentation import BaselineSet
from kraken_tpu.dataset.ro import PairWiseROSet, PageWiseROSet
from kraken_tpu.dataset.loader import DataLoader, bucket_collate

__all__ = ['ImageInputTransforms', 'collate_sequences', 'global_align',
           'compute_confusions', 'ArrowIPCRecognitionDataset',
           'GroundTruthDataset', 'PolygonGTDataset', 'BaselineSet',
           'PairWiseROSet', 'PageWiseROSet', 'DataLoader', 'bucket_collate']
