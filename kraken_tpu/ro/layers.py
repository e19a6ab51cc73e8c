"""
kraken_tpu.ro.layers
~~~~~~~~~~~~~~~~~~~~

Neural reading-order model: a 2-layer MLP scoring pairwise order relations
between line/region spatial features (reference: kraken/lib/ro/layers.py).
Feature size is 2·num_classes + 12 (one-hot class + center/start/end points
of both elements).
"""
import json
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from kraken_tpu.nn.layers import _xavier_uniform

logger = logging.getLogger(__name__)

__all__ = ['ROMLP']


class ROMLP:
    """A 2-layer MLP for reading order determination."""

    _kraken_min_version = '5.0.0'
    model_type = ['reading_order']

    def __init__(self, rng=None, **kwargs):
        self.class_mapping = kwargs.get('class_mapping')
        if self.class_mapping is None:
            raise ValueError('Reading order model arguments lack `class_mapping`.')
        self.level = kwargs.get('level')
        if self.level is None:
            raise ValueError('Reading order model arguments lack `level`.')
        self.user_metadata = dict(kwargs)
        num_classes = max(0, *self.class_mapping.values()) + 1 if self.class_mapping else 1
        self.feature_size = 2 * num_classes + 12
        self.hidden_size = self.feature_size * 2
        rng = rng if rng is not None else jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        k1, k2 = jax.random.split(rng)
        self.params = {
            'fc1.weight': _xavier_uniform(k1, (self.hidden_size, self.feature_size)),
            'fc1.bias': jnp.zeros((self.hidden_size,), jnp.float32),
            'fc2.weight': _xavier_uniform(k2, (1, self.hidden_size)),
            'fc2.bias': jnp.zeros((1,), jnp.float32),
        }

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        h = jax.nn.relu(x @ params['fc1.weight'].T + params['fc1.bias'])
        return h @ params['fc2.weight'].T + params['fc2.bias']

    def forward(self, x, params: Optional[dict] = None):
        return self.apply(params if params is not None else self.params, jnp.asarray(x))

    def __call__(self, x):
        return self.forward(x)

    def prepare_for_inference(self, config):
        pass

    # --------------------------------------------------------- persistence
    def state_dict(self) -> dict[str, np.ndarray]:
        return {f'nn.{k}': np.asarray(v) for k, v in self.params.items()}

    def load_state_dict(self, state_dict: dict, prefix: str = 'nn.') -> None:
        for k in list(self.params):
            key = f'{prefix}{k}'
            if key not in state_dict:
                raise ValueError(f'Missing key {key} in state dict')
            arr = np.asarray(state_dict[key])
            if arr.shape != tuple(self.params[k].shape):
                raise ValueError(f'Shape mismatch for {key}')
            self.params[k] = jnp.asarray(arr)

    def load_coreml_weights(self, name: str, spec) -> None:
        """Loads weights from a CoreML spec's `{name}_mlp_lin_{0,1}` layers."""
        from kraken_tpu.models._coreml import _submessages, _floats
        for idx, (w_key, b_key, rows, cols) in enumerate(
                [('fc1.weight', 'fc1.bias', self.hidden_size, self.feature_size),
                 ('fc2.weight', 'fc2.bias', 1, self.hidden_size)]):
            layer = spec.layer(f'{name}_mlp_lin_{idx}')
            if layer is None:
                raise ValueError(f'CoreML layer {name}_mlp_lin_{idx} not found')
            fields = _submessages(layer.body)
            self.params[w_key] = jnp.asarray(_floats(fields[20][0]).reshape(rows, cols))
            self.params[b_key] = jnp.asarray(_floats(fields[21][0]))

    def get_spec(self, name) -> str:
        return f'[1,0,0,1 RO{{{name}}}{self.feature_size},{self.hidden_size}]'
