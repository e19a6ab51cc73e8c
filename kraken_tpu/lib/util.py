"""
kraken_tpu.lib.util
~~~~~~~~~~~~~~~~~~~

PIL/numpy helpers (reference: kraken/lib/util.py).
"""
import unicodedata
from os import PathLike
from pathlib import Path
from typing import Union

import numpy as np
from PIL import Image

__all__ = ['pil2array', 'array2pil', 'is_bitonal', 'open_image', 'get_im_str',
           'is_printable', 'make_printable', 'parse_gt_path', 'default_segmentation_model']


def default_segmentation_model() -> Path:
    """Packaged default baseline-segmentation weights: the bundled
    safetensors demonstrator (trained on the annotated fixture corpus;
    quality floors pinned in tests/test_seg_parity.py), with a CoreML
    ``blla.mlmodel`` drop-in taking precedence when a user installs one
    next to the package (the reference's packaged-model location,
    kraken/kraken.py:43). Shared by the CLI `segment -bl` fallback and
    ``SegmentationTaskModel.load_model()`` so both default paths resolve
    to the same file."""
    pkg = Path(__file__).parent.parent
    coreml = pkg / 'blla.mlmodel'
    return coreml if coreml.exists() else pkg / 'blla.safetensors'


def open_image(fname: Union[str, PathLike], mode=None) -> Image.Image:
    """Opens an image file applying EXIF orientation."""
    from PIL import ImageOps
    im = Image.open(fname)
    im = ImageOps.exif_transpose(im)
    if mode:
        im = im.convert(mode)
    return im


def get_im_str(im: Image.Image) -> str:
    return f'{im.filename if hasattr(im, "filename") else im}'


def pil2array(im: Image.Image, alpha: int = 0) -> np.ndarray:
    """Converts a PIL image to a numpy array, mapping mode '1' to uint8."""
    if im.mode == '1':
        return np.array(im.convert('L'))
    return np.array(im)


def array2pil(arr: np.ndarray) -> Image.Image:
    """Converts a numpy array back to a PIL image."""
    if arr.dtype == np.dtype('B'):
        if arr.ndim == 2:
            return Image.frombytes('L', (arr.shape[1], arr.shape[0]), arr.tobytes())
        if arr.ndim == 3:
            return Image.frombytes('RGB', (arr.shape[1], arr.shape[0]), arr.tobytes())
        raise Exception('bad image rank')
    if arr.dtype == np.dtype('float32'):
        return Image.frombytes('F', (arr.shape[1], arr.shape[0]), arr.tobytes())
    raise Exception(f'unknown image type: {arr.dtype}')


def is_bitonal(im: Union[Image.Image, np.ndarray]) -> bool:
    """True if an image (or array) contains only two intensity values."""
    if isinstance(im, Image.Image):
        return im.getcolors(2) is not None and len(im.getcolors(2)) == 2
    return len(np.unique(im)) == 2


def is_printable(char: str) -> bool:
    """
    True when a code point renders on its own: control, combining-mark, and
    non-space separator characters (which `kraken show` lists by Unicode
    name instead) are not printable. Reference: kraken/lib/util.py:57.
    """
    if not char:
        return False
    if char == ' ':
        return True
    return unicodedata.category(char)[0] not in ('C', 'M', 'Z')


def make_printable(char: str) -> str:
    """
    Returns a printable representation of a code point: control and combining
    characters are replaced by their Unicode names.
    """
    if not char:
        return ''
    if len(char) > 1:
        return ''.join(make_printable(c) for c in char)
    if unicodedata.category(char)[0] in ('C', 'M', 'Z') and char != ' ':
        try:
            return unicodedata.name(char)
        except ValueError:
            return f'U+{ord(char):04X}'
    return char


def parse_gt_path(path: Union[str, PathLike],
                  suffix: str = '.gt.txt',
                  split=None,
                  skip_empty_lines: bool = True,
                  base_dir=None,
                  text_direction: str = 'horizontal-lr'):
    """
    Parses an image + `.gt.txt` transcription pair into a BBoxLine covering
    the whole image (reference: lib/util.py:120).
    """
    from kraken_tpu.containers import BBoxLine

    path = Path(path)
    if split is None:
        base = path
        while base.suffixes:
            base = base.with_suffix('')
        gt_path = Path(str(base) + suffix)
    else:
        gt_path = Path(split(path) + suffix)
    try:
        with Image.open(path) as im:
            w, h = im.size
    except Exception as e:
        raise ValueError(f'Could not open image {path}: {e}') from e
    if not gt_path.is_file():
        raise ValueError(f'No transcription file {gt_path} for image {path}')
    text = gt_path.read_text(encoding='utf-8').strip('\n\r')
    if not text and skip_empty_lines:
        raise ValueError(f'Ground truth line has no transcription: {gt_path}')
    return BBoxLine(id=f'_{path.name}',
                    bbox=(0, 0, w, h),
                    text=text,
                    base_dir=base_dir,
                    imagename=path,
                    text_direction=text_direction)


_XLA_CACHE_SET = False


def enable_xla_cache() -> None:
    """
    Persists compiled XLA programs across processes so repeated
    inference/training runs skip the cold compile of each
    (model, width-bucket) pair. Directory from ``KRAKEN_TPU_XLA_CACHE``
    (set to ``0`` to disable), default ``~/.cache/kraken_tpu/xla``.
    """
    global _XLA_CACHE_SET
    if _XLA_CACHE_SET:
        return
    _XLA_CACHE_SET = True
    import os
    try:
        import jax
        cache = os.environ.get('KRAKEN_TPU_XLA_CACHE',
                               os.path.expanduser('~/.cache/kraken_tpu/xla'))
        if cache and cache != '0':
            jax.config.update('jax_compilation_cache_dir', cache)
            jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        import logging
        logging.getLogger(__name__).debug('Persistent XLA cache unavailable')
