"""
kraken_tpu.binarization
~~~~~~~~~~~~~~~~~~~~~~~

nlbin adaptive (non-linear) binarization (reference: kraken/binarization.py,
algorithm by Thomas Breuel/ocropus): estimate the page background with a
zoomed percentile filter, flatten the image against it, estimate black/white
thresholds from high-variance (text) regions only, and threshold.

Two implementations: :func:`nlbin` is the host scipy path with exact
reference semantics; :func:`nlbin_device` (in kraken_tpu.ops.binarize) is the
jitted XLA formulation used in the batched page pipeline.
"""
import logging
import warnings
from typing import TYPE_CHECKING

import numpy as np
from scipy.ndimage import (affine_transform, binary_dilation, gaussian_filter,
                           percentile_filter, zoom as _zoom)

from kraken_tpu.exceptions import KrakenInputException
from kraken_tpu.lib.util import array2pil, get_im_str, is_bitonal, pil2array

if TYPE_CHECKING:
    from PIL import Image

__all__ = ['nlbin']

logger = logging.getLogger(__name__)


def nlbin(im: 'Image.Image',
          threshold: float = 0.5,
          zoom: float = 0.5,
          escale: float = 1.0,
          border: float = 0.1,
          perc: int = 80,
          range: int = 20,
          low: int = 5,
          high: int = 90) -> 'Image.Image':
    """
    Performs binarization using non-linear processing.

    Args:
        im: Input image
        threshold: final binarization threshold
        zoom: zoom for background page estimation
        escale: scale for estimating a mask over the text region
        border: ignore this much of the border
        perc: percentage for percentile filters
        range: range (size) for percentile filters
        low: percentile for black estimation
        high: percentile for white estimation

    Returns:
        PIL.Image.Image containing the binarized image

    Raises:
        KrakenInputException: when trying to binarize an empty image.
    """
    im_str = get_im_str(im)
    logger.info(f'Binarizing {im_str}')
    if is_bitonal(im):
        logger.info(f'Skipping binarization because {im_str} is bitonal.')
        return im
    im = im.convert('L')
    raw = pil2array(im)
    raw = raw / float(np.iinfo(raw.dtype).max)
    if np.amax(raw) == np.amin(raw):
        logger.warning(f'Trying to binarize empty image {im_str}')
        raise KrakenInputException('Image is empty')
    image = raw - np.amin(raw)
    image /= np.amax(image)

    # background estimation on a zoomed-down copy
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', UserWarning)
        m = _zoom(image, zoom)
        m = percentile_filter(m, perc, size=(range, 2))
        m = percentile_filter(m, perc, size=(2, range))
        mh, mw = m.shape
        oh, ow = image.shape
        scale = np.diag([mh * 1.0 / oh, mw * 1.0 / ow])
        m = affine_transform(m, scale, output_shape=image.shape)
    w, h = np.minimum(np.array(image.shape), np.array(m.shape))
    flat = np.clip(image[:w, :h] - m[:w, :h] + 1, 0, 1)

    # estimate low/high thresholds from high-variance (text) regions only
    d0, d1 = flat.shape
    o0, o1 = int(border * d0), int(border * d1)
    est = flat[o0:d0 - o0, o1:d1 - o1]
    v = est - gaussian_filter(est, escale * 20.0)
    v = gaussian_filter(v ** 2, escale * 20.0) ** 0.5
    v = (v > 0.3 * np.amax(v))
    v = binary_dilation(v, structure=np.ones((int(escale * 50), 1)))
    v = binary_dilation(v, structure=np.ones((1, int(escale * 50))))
    est = est[v]
    lo = np.percentile(est.ravel(), low)
    hi = np.percentile(est.ravel(), high)
    flat -= lo
    flat /= (hi - lo)
    flat = np.clip(flat, 0, 1)
    logger.debug(f'Thresholding at {threshold}')
    return array2pil(np.array(255 * (flat > threshold), 'B'))
