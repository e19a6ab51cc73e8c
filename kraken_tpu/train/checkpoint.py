"""
kraken_tpu.train.checkpoint
~~~~~~~~~~~~~~~~~~~~~~~~~~~

Training checkpoints: a single safetensors file holding the model weights in
the standard kraken container layout (so every checkpoint doubles as a
loadable weights file) plus optimizer state under a reserved `__training__`
prefix and a `training_meta` JSON metadata block (epoch, step, config,
metrics history).
"""
import json
import logging
import uuid
from os import PathLike
from pathlib import Path
from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from kraken_tpu.models.writers import _model_metadata

logger = logging.getLogger(__name__)

__all__ = ['save_checkpoint', 'load_checkpoint', 'convert_checkpoint',
           'config_from_checkpoint']


def config_from_checkpoint(training_meta: dict):
    """
    Re-inflates the training config recorded in a checkpoint's metadata into
    its registered class (first-party or `kraken.configs` plugin). Values
    pass through JSON with `default=str`, so non-scalar members (injected
    functions etc.) come back as strings — the registry restores the class
    and its defaults, not live callables.
    """
    from kraken_tpu.configs import resolve_config
    hyper_params = dict(training_meta.get('hyper_params', {}))
    name = hyper_params.pop('config_class', None)
    if name is None:
        return None
    cls = resolve_config(name)
    return cls(**hyper_params)


def _flatten_state(state, prefix: str) -> dict[str, np.ndarray]:
    flat = {}
    leaves, treedef = jax.tree.flatten(state)
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, 'shape'):
            flat[f'{prefix}{i}'] = np.asarray(leaf)
    return flat


def save_checkpoint(model, opt_state, path: Union[str, PathLike],
                    epoch: int = 0, global_step: int = 0,
                    hyper_params: Optional[dict] = None,
                    extras: Optional[dict[str, Any]] = None) -> None:
    """
    Writes a resumable checkpoint that also loads as a plain model file.
    """
    from safetensors.numpy import save_file

    prefix = str(uuid.uuid4())
    tensors: dict[str, np.ndarray] = {}
    model_map = {prefix: _model_metadata(model)}
    for k, v in model.state_dict().items():
        tensors[f'{prefix}.{k}'] = np.ascontiguousarray(v)
    if opt_state is not None:
        tensors.update(_flatten_state(opt_state, '__training__.opt.'))
    meta = {'epoch': epoch,
            'global_step': global_step,
            'hyper_params': hyper_params or {},
            'prefix': prefix}
    meta.update(extras or {})
    save_file(tensors, Path(path),
              metadata={'kraken_meta': json.dumps(model_map),
                        'training_meta': json.dumps(meta, default=str)})


def load_checkpoint(path: Union[str, PathLike], opt_state_template=None):
    """
    Loads a checkpoint: returns (model, opt_state, training_meta). The
    optimizer state is restored into `opt_state_template`'s tree structure
    (None leaves it unrestored).
    """
    from safetensors import safe_open
    from safetensors.numpy import load_file
    from kraken_tpu.models.loaders import load_safetensors

    models = load_safetensors(path)
    if not models:
        raise ValueError(f'No model found in checkpoint {path}')
    model = models[0]
    with safe_open(path, framework='np') as f:
        metadata = f.metadata() or {}
    training_meta = json.loads(metadata.get('training_meta', '{}'))
    opt_state = None
    if opt_state_template is not None:
        tensors = load_file(path)
        opt_keys = sorted((k for k in tensors if k.startswith('__training__.opt.')),
                          key=lambda k: int(k.rsplit('.', 1)[1]))
        leaves, treedef = jax.tree.flatten(opt_state_template)
        array_positions = [i for i, leaf in enumerate(leaves) if hasattr(leaf, 'shape')]
        if len(opt_keys) == len(array_positions):
            for pos, key in zip(array_positions, opt_keys):
                leaves[pos] = jnp.asarray(tensors[key])
            opt_state = jax.tree.unflatten(treedef, leaves)
        else:
            logger.warning(f'Optimizer state in {path} does not match template '
                           f'({len(opt_keys)} vs {len(array_positions)} arrays); skipping restore.')
    return model, opt_state, training_meta


def convert_checkpoint(path: Union[str, PathLike], output: Union[str, PathLike],
                       format: str = 'safetensors') -> None:
    """
    Strips training state from a checkpoint, producing a plain weights file
    (reference: kraken/models/convert.py convert_models).
    """
    from kraken_tpu.models import load_models, write_models
    models = load_models(path)
    write_models(models, output, format=format)
