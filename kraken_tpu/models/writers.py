"""
kraken_tpu.models.writers
~~~~~~~~~~~~~~~~~~~~~~~~~

Model serialization. Writes the reference engine's multi-model safetensors
container format (/root/reference/kraken/models/writers.py): one key prefix
per model, `kraken_meta` JSON metadata with `_model`/`_tasks`/
`_kraken_min_version` plus the model's user metadata, so files written here
load in the reference engine and vice versa.
"""
import json
import logging
import uuid
from os import PathLike
from pathlib import Path
from typing import Union
from collections.abc import Sequence

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ['write_models', 'write_safetensors']


def _model_metadata(model) -> dict:
    model_name = 'TorchVGSLModel'
    if type(model).__name__ == 'ROMLP':
        model_name = 'ROMLP'
    meta = {'_kraken_min_version': getattr(model, '_kraken_min_version', '5.0.0'),
            '_tasks': model.model_type if getattr(model, 'model_type', None) else None,
            '_model': model_name}
    user_meta = dict(getattr(model, 'user_metadata', {}))
    codec = getattr(model, 'codec', None)
    if codec is not None:
        user_meta['codec'] = codec.c2l
    elif isinstance(user_meta.get('codec'), str):
        user_meta['codec'] = json.loads(user_meta['codec'])
    meta.update(user_meta)
    return meta


def write_safetensors(models: Sequence, path: Union[str, PathLike]) -> None:
    """
    Serializes one or more models into a kraken-compatible safetensors file.
    """
    from safetensors.numpy import save_file

    tensors: dict[str, np.ndarray] = {}
    model_map: dict[str, dict] = {}
    for model in models:
        prefix = str(uuid.uuid4())
        model_map[prefix] = _model_metadata(model)
        for k, v in model.state_dict().items():
            tensors[f'{prefix}.{k}'] = np.ascontiguousarray(v)
    save_file(tensors, Path(path), metadata={'kraken_meta': json.dumps(model_map)})


def write_models(models: Sequence, path: Union[str, PathLike], format: str = 'safetensors') -> None:
    """
    Writes models to `path` in the requested format.
    """
    if format == 'safetensors':
        write_safetensors(models, path)
    elif format == 'coreml':
        from kraken_tpu.models._coreml_writer import write_coreml
        write_coreml(models, path)
    else:
        # third-party writers via the 'kraken.writers' entry-point group
        # (reference: kraken/models/writers.py:36)
        import importlib.metadata
        for ep in importlib.metadata.entry_points(group='kraken.writers'):
            if ep.name == format:
                ep.load()(models, path)
                return
        raise ValueError(f'Unknown model format {format}')
