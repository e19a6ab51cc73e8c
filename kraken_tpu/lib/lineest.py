"""
kraken_tpu.lib.lineest
~~~~~~~~~~~~~~~~~~~~~~

Centerline estimation and vertical dewarping for bbox line images in the
ocropy CenterNormalizer family (behavioral reference:
kraken/lib/lineest.py). Used by the input transform pipeline for 1-channel
bbox models with valid_norm.

The dewarp itself is a vectorized fixed-height band gather around the
per-column centerline (the ancestor loops per column). The centerline
estimate stays on scipy kernels deliberately: it takes an argmax over the
smoothed line, and even 1e-16 kernel-rounding differences (e.g. from the
cv2-backed fastfilters) can flip ties and shift the dewarped image by a
pixel, breaking byte-exact recognition parity. Note that the smoothing of
the integer argmax track runs in integer arithmetic — scipy preserves the
input dtype — and that truncation is part of the pinned behavior.
"""
import warnings
from typing import TYPE_CHECKING

import numpy as np
from scipy.ndimage import (affine_transform, gaussian_filter,
                           gaussian_filter1d, uniform_filter)

if TYPE_CHECKING:
    from PIL import Image

__all__ = ['CenterNormalizer', 'dewarp']


def scale_to_h(img: np.ndarray, target_height: int, order: int = 1,
               dtype=np.dtype('f'), cval: int = 0) -> np.ndarray:
    """Scales a 2D image to a target height preserving aspect ratio."""
    h, w = img.shape
    scale = target_height * 1.0 / h
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', UserWarning)
        resized = affine_transform(img * 1.0,
                                   np.full(2, 1.0 / scale),
                                   order=order,
                                   output_shape=(target_height, int(scale * w)),
                                   mode='constant', cval=cval)
    return resized.astype(dtype)


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
        """
        Fits the centerline of an ink-intensity array (text bright on dark):
        a heavy blur turns each column into a unimodal intensity profile
        whose argmax tracks the text core; a faint whole-line box blur is
        mixed in so empty columns inherit their neighborhood's maximum
        instead of defaulting to row 0. The track is then smoothed (integer
        arithmetic, see module docstring) and the half-band radius `r` set
        from the mean |row - center| over ink pixels.
        """
        h, w = line.shape
        self.shape = (h, w)
        blurred = gaussian_filter(line, sigma=(h * 0.5, h * self.smoothness),
                                  mode='constant')
        blurred += 1e-3 * uniform_filter(blurred, (h * 0.5, w), mode='constant')
        track = blurred.argmax(axis=0)
        self.center = np.asarray(gaussian_filter1d(track, h * self.extra), 'i')
        ink_rows, ink_cols = np.nonzero(line)
        self.mad = np.abs(ink_rows - self.center[ink_cols]).mean()
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
        band = self.dewarp(img, cval=cval, dtype=dtype)
        if not band.shape[0]:
            band = img
        return scale_to_h(band, self.target_height, order=order, dtype=dtype,
                          cval=cval)


def dewarp(normalizer: CenterNormalizer, im: 'Image.Image') -> 'Image.Image':
    """Dewarps a PIL line image with a CenterNormalizer."""
    from kraken_tpu.lib.util import array2pil, pil2array

    line = pil2array(im)
    ink = np.amax(line) - line  # dark-on-light → ink intensity
    normalizer.measure(ink * 1.0 / np.amax(ink))
    return array2pil(normalizer.normalize(line, cval=np.amax(line)))
