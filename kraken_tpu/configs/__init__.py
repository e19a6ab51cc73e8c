"""
kraken_tpu.configs
~~~~~~~~~~~~~~~~~~

Configuration dataclass-style objects plus the config-class registry
(reference: kraken/configs/__init__.py + the `kraken.configs` entry-point
group, pyproject.toml:113-126). Where the reference registers config
classes as torch-unpickling safe globals, checkpoints here are safetensors
with JSON metadata — the registry's job is re-inflating a recorded
`config_class` name (first-party or third-party plugin) into the live
class when a checkpoint is resumed.
"""
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
           'SegmentationTrainingDataConfig',
           'register_config', 'resolve_config']

# first-party registrations; extended by register_config and the
# 'kraken.configs' entry-point group
CONFIGS = {name: globals()[name] for name in __all__
           if isinstance(globals().get(name), type)}


def register_config(cls):
    """Class decorator registering a config class under its own name."""
    CONFIGS[cls.__name__] = cls
    return cls


def resolve_config(name: str):
    """
    Resolves a config class name to its class: first-party and
    decorator-registered classes first, then the `kraken.configs`
    entry-point group for third-party plugins.
    """
    if name in CONFIGS:
        return CONFIGS[name]
    import importlib.metadata
    for ep in importlib.metadata.entry_points(group='kraken.configs'):
        if ep.name == name:
            cls = ep.load()
            CONFIGS[name] = cls
            return cls
    raise ValueError(f'No config class registered under {name!r}')
