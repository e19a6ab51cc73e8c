"""
kraken_tpu.registry
~~~~~~~~~~~~~~~~~~~

Cross-cutting registries (reference: kraken/registry.py): hyperparameter
choice registries consumed by the CLIs, a `load_model` convenience
resolving any supported weights file into task model wrappers, and the
third-party CLI plugin loader behind the `kraken.cli`/`ketos.cli`
entry-point groups (reference: kraken/kraken.py:818-819,
kraken/ketos/__init__.py:109-110).
"""
import importlib.metadata
import logging
from typing import Optional, Union

logger = logging.getLogger(__name__)

__all__ = ['OPTIMIZERS', 'SCHEDULERS', 'STOPPERS', 'PRECISIONS', 'load_model',
           'register_cli_plugins']


def register_cli_plugins(cli, group: str) -> None:
    """
    Adds third-party click subcommands registered under the entry-point
    `group` to the `cli` group. First-party subcommands are registered
    directly at import time and take precedence over same-named plugins; a
    plugin that fails to import is skipped with a warning instead of taking
    the whole CLI down.
    """
    try:
        entry_points = sorted(importlib.metadata.entry_points(group=group),
                              key=lambda ep: ep.name)
    except Exception as e:  # pragma: no cover - metadata backend failure
        logger.warning(f'Entry point discovery for {group} failed: {e}')
        return
    for ep in entry_points:
        if ep.name in getattr(cli, 'commands', {}):
            continue
        try:
            cli.add_command(ep.load(), name=ep.name)
            logger.debug(f'Loaded CLI plugin {ep.name} from {ep.value}')
        except Exception as e:
            logger.warning(f'Failed to load CLI plugin {ep.name} ({ep.value}): {e}')

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
