"""
kraken_tpu.lib.lineest
~~~~~~~~~~~~~~~~~~~~~~

Centerline estimation and dewarping for bbox line images (ocropy-style
CenterNormalizer; reference: kraken/lib/lineest.py). Used by the input
transform pipeline for 1-channel bbox models with valid_norm.
"""
import warnings
from typing import TYPE_CHECKING

import numpy as np
# NOTE: stays on scipy deliberately — the centerline estimate takes an
# argmax over the smoothed line, and even 1e-16 kernel-rounding differences
# (e.g. from the cv2-backed fastfilters) can flip ties and shift the
# dewarped image by a pixel, breaking byte-exact recognition parity with
# the reference.
from scipy.ndimage import affine_transform, gaussian_filter, gaussian_filter1d, uniform_filter

if TYPE_CHECKING:
    from PIL import Image

__all__ = ['CenterNormalizer', 'dewarp']


def scale_to_h(img: np.ndarray, target_height: int, order: int = 1,
               dtype=np.dtype('f'), cval: int = 0) -> np.ndarray:
    """Scales a 2D image to a target height preserving aspect ratio."""
    h, w = img.shape
    scale = target_height * 1.0 / h
    target_width = int(scale * w)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', UserWarning)
        output = affine_transform(1.0 * img, np.ones(2) / scale, order=order,
                                  output_shape=(target_height, target_width),
                                  mode='constant', cval=cval)
    return np.array(output, dtype=dtype)


class CenterNormalizer:
    """
    Estimates the text centerline from a gaussian-smoothed column argmax and
    vertically dewarps the line to a fixed height around it.
    """

    def __init__(self, target_height: int = 48, params: tuple = (4, 1.0, 0.3)):
        self.target_height = target_height
        self.range, self.smoothness, self.extra = params

    def setHeight(self, target_height: int) -> None:
        self.target_height = target_height

    def measure(self, line: np.ndarray) -> None:
        h, w = line.shape
        smoothed = gaussian_filter(line, (h * 0.5, h * self.smoothness), mode='constant')
        smoothed += 0.001 * uniform_filter(smoothed, (h * 0.5, w), mode='constant')
        self.shape = (h, w)
        a = np.argmax(smoothed, axis=0)
        a = gaussian_filter(a, h * self.extra)
        self.center = np.array(a, 'i')
        deltas = np.abs(np.arange(h)[:, np.newaxis] - self.center[np.newaxis, :])
        self.mad = np.mean(deltas[line != 0])
        self.r = int(1 + self.range * self.mad)

    def dewarp(self, img: np.ndarray, cval: int = 0, dtype=np.dtype('f')) -> np.ndarray:
        if img.shape != self.shape:
            raise Exception('Measured and dewarp image shapes different')
        h, w = img.shape
        padded = np.vstack([cval * np.ones((h, w)), img, cval * np.ones((h, w))])
        center = self.center + h
        # extract a fixed-height band around the centerline per column
        rows = np.clip(center[None, :] + np.arange(-self.r, self.r)[:, None], 0, padded.shape[0] - 1)
        dewarped = padded[rows, np.arange(w)[None, :]]
        return np.array(dewarped, dtype=dtype)

    def normalize(self, img: np.ndarray, order: int = 1, dtype=np.dtype('f'),
                  cval: int = 0) -> np.ndarray:
        dewarped = self.dewarp(img, cval=cval, dtype=dtype)
        if dewarped.shape[0] == 0:
            dewarped = img
        return scale_to_h(dewarped, self.target_height, order=order, dtype=dtype, cval=cval)


def dewarp(normalizer: CenterNormalizer, im: 'Image.Image') -> 'Image.Image':
    """Dewarps a PIL line image with a CenterNormalizer."""
    from kraken_tpu.lib.util import array2pil, pil2array

    line = pil2array(im)
    temp = np.amax(line) - line
    temp = temp * 1.0 / np.amax(temp)
    normalizer.measure(temp)
    line = normalizer.normalize(line, cval=np.amax(line))
    return array2pil(line)
