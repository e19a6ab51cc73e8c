from kraken_tpu.ro.layers import ROMLP
from kraken_tpu.ro.features import element_features

__all__ = ['ROMLP', 'element_features']
