from kraken_tpu.tasks.recognition import RecognitionTaskModel
from kraken_tpu.tasks.segmentation import SegmentationTaskModel
from kraken_tpu.tasks.align import ForcedAlignmentTaskModel

__all__ = ['RecognitionTaskModel', 'SegmentationTaskModel', 'ForcedAlignmentTaskModel']
