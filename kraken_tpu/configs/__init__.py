from kraken_tpu.configs.base import (Config, RecognitionInferenceConfig,
                                     SegmentationInferenceConfig,
                                     TrainingConfig, TrainingDataConfig,
                                     RecognitionTrainingConfig,
                                     SegmentationTrainingConfig,
                                     ReadingOrderTrainingConfig,
                                     PretrainingConfig,
                                     RecognitionTrainingDataConfig,
                                     SegmentationTrainingDataConfig)

__all__ = ['Config', 'RecognitionInferenceConfig', 'SegmentationInferenceConfig',
           'TrainingConfig', 'TrainingDataConfig', 'RecognitionTrainingConfig',
           'SegmentationTrainingConfig', 'ReadingOrderTrainingConfig',
           'PretrainingConfig', 'RecognitionTrainingDataConfig',
           'SegmentationTrainingDataConfig']
