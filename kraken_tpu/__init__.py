"""
kraken_tpu — a TPU-native OCR/HTR engine.

A ground-up reimplementation of the capabilities of kraken (mittagessen/kraken)
on JAX/XLA/Pallas: trainable baseline/region layout analysis, reading order,
VGSL-specified CNN+BiLSTM text recognition with CTC decoding, RTL/BiDi support,
and ALTO/PageXML/hOCR/abbyyXML serialization.

The compute path (convolutions, LSTMs, CTC, image preprocessing) runs as jitted
XLA programs with Pallas kernels for the hot ops; irregular geometry and
serialization run on host.
"""

__version__ = '0.1.0'
