"""
Model registry.

The reference engine wires model classes through Python entry points
(/root/reference/kraken/models/utils.py); here a plain registry dict serves
the same role, with entry-point groups (`kraken.models`) also consulted so
third-party plugins keep working when installed. The reference's class names
('TorchVGSLModel', 'ROMLP') are registered as aliases so model files written
by either engine resolve in both.
"""
import importlib.metadata
import logging

logger = logging.getLogger(__name__)

__all__ = ['create_model', 'register_model']

_REGISTRY: dict[str, object] = {}


def register_model(name: str, factory=None):
    """Registers a model class under `name`; usable as a decorator."""
    if factory is None:
        def _inner(cls):
            _REGISTRY[name] = cls
            return cls
        return _inner
    _REGISTRY[name] = factory
    return factory


def _resolve(name: str):
    if name in _REGISTRY:
        return _REGISTRY[name]
    # lazy built-ins (avoids import cycles during package initialization)
    if name in ('TorchVGSLModel', 'VGSLModel'):
        from kraken_tpu.vgsl import VGSLModel
        _REGISTRY[name] = VGSLModel
        return VGSLModel
    if name == 'ROMLP':
        from kraken_tpu.ro.layers import ROMLP
        _REGISTRY[name] = ROMLP
        return ROMLP
    if name == 'Wav2Vec2Mask':
        from kraken_tpu.pretrain.layers import Wav2Vec2Mask
        _REGISTRY[name] = Wav2Vec2Mask
        return Wav2Vec2Mask
    try:
        for ep in importlib.metadata.entry_points(group='kraken.models'):
            if ep.name == name:
                return ep.load()
    except Exception:
        pass
    raise ValueError(f'No model class registered under name {name!r}')


def create_model(name: str, **kwargs):
    """Instantiates a registered model class by name."""
    cls = _resolve(name)
    return cls(**kwargs)


