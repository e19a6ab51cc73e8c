"""
kraken_tpu.registry
~~~~~~~~~~~~~~~~~~~

Cross-cutting registries (reference: kraken/registry.py): hyperparameter
choice registries consumed by the CLIs and a `load_model` convenience
resolving any supported weights file into task model wrappers.
"""
import logging
from typing import Optional, Union

logger = logging.getLogger(__name__)

__all__ = ['OPTIMIZERS', 'SCHEDULERS', 'STOPPERS', 'PRECISIONS', 'load_model']

OPTIMIZERS = ['Adam', 'AdamW', 'SGD', 'RMSprop', 'Lamb']
SCHEDULERS = ['constant', '1cycle', 'exponential', 'cosine', 'step', 'reduceonplateau']
STOPPERS = ['early', 'fixed']
PRECISIONS = ['64-true', '32-true', 'bf16-true', 'bf16-mixed', '16-true', '16-mixed']


def load_model(path, tasks: Optional[list[str]] = None):
    """
    Loads all models in a weights file and wraps them in the appropriate task
    model classes.

    Returns:
        A dict mapping task names to task model instances.
    """
    from kraken_tpu.models import load_models
    models = load_models(path, tasks=tasks)
    wrapped = {}
    types = {t for m in models for t in getattr(m, 'model_type', [])}
    if 'recognition' in types and (tasks is None or 'recognition' in tasks):
        from kraken_tpu.tasks import RecognitionTaskModel
        wrapped['recognition'] = RecognitionTaskModel(models)
    if 'segmentation' in types and (tasks is None or 'segmentation' in tasks):
        from kraken_tpu.tasks import SegmentationTaskModel
        wrapped['segmentation'] = SegmentationTaskModel(models)
    return wrapped
