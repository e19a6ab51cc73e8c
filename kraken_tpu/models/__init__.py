from kraken_tpu.models.loaders import load_models, load_safetensors, load_coreml
from kraken_tpu.models.writers import write_models, write_safetensors
from kraken_tpu.models.utils import create_model, register_model

__all__ = ['load_models', 'load_safetensors', 'load_coreml',
           'write_models', 'write_safetensors', 'create_model', 'register_model']
