"""
kraken_tpu.dataset.transforms
~~~~~~~~~~~~~~~~~~~~~~~~~~~~~

Image input transform pipeline for recognition/segmentation networks
(reference: kraken/lib/dataset/utils.py ImageInputTransforms:54). Maps PIL
images to normalized float32 CHW numpy arrays ready for device upload:

    mode conversion → [forced nlbin] → centerline dewarp | resize →
    pad → to-array → scale to [0,1] → invert → permute

Transform selection by the VGSL input spec (batch, height, width, channels)
follows the reference's rules (utils.py:98-119): a 1-high input with >3
"channels" means a legacy channels-as-height line network with optional
centerline normalization; fixed height ⇒ proportional Lanczos resize; fixed
height+width ⇒ exact resize, no padding.

Implemented on PIL/numpy only (no torchvision).
"""
import numbers
from typing import Union

import numpy as np
from PIL import Image

from kraken_tpu.exceptions import KrakenInputException
from kraken_tpu.lib.lineest import CenterNormalizer, dewarp

__all__ = ['ImageInputTransforms']


def _fixed_resize(img: Image.Image, scale: tuple[int, int],
                  resample=Image.Resampling.LANCZOS,
                  reducing_gap=None) -> Image.Image:
    """
    Resize to (height, width), inferring a 0-valued dim proportionally.

    Stays on PIL's Lanczos: the reference's golden decodes
    (tests/test_rpred.py) are pinned to PIL resampling semantics — a cv2
    INTER_AREA swap measured ~5x faster but costs CER 0.095 on the
    overfit parity fixture's baseline path (measured round 3), and
    `reducing_gap` is a no-op at line-normalization factors (~1.25x,
    below PIL's pre-reduce threshold, verified byte-identical goldens).
    Line-height normalization is therefore pinned to exact PIL Lanczos;
    trained models are sensitive to the resampling spectrum of their
    inputs (see docs/architecture.md "Resampling is part of the model
    contract").
    """
    w, h = img.size
    oh, ow = scale
    if oh == 0:
        oh = max(1, int(h * ow / w))
    elif ow == 0:
        ow = max(1, int(w * oh / h))
    if (resample == Image.Resampling.LANCZOS and reducing_gap is None
            and img.mode == 'L'):
        # byte-exact C++ port of PIL's fixed-point Lanczos (self-checked
        # against PIL at load time; see kraken_tpu/native)
        from kraken_tpu import native
        out = native.resize_lanczos_native(np.asarray(img), oh, ow)
        if out is not None:
            return Image.fromarray(out, 'L')
    return img.resize((ow, oh), resample, reducing_gap=reducing_gap)


class ImageInputTransforms:
    def __init__(self,
                 batch: int,
                 height: int,
                 width: int,
                 channels: int,
                 pad: Union[int, tuple[int, int], tuple[int, int, int, int]],
                 valid_norm: bool = True,
                 force_binarization: bool = False,
                 dtype=np.float32) -> None:
        """
        Args:
            batch: mini-batch size (kept for spec compatibility)
            height: desired height (0 = variable)
            width: desired width (0 = variable)
            channels: color channels; >3 with height 1 means
                      channels-as-height line input
            pad: horizontal padding (int = left/right, 2-tuple = (l/r, t/b),
                 4-tuple = (l, t, r, b))
            valid_norm: allow centerline normalization where applicable
            force_binarization: apply nlbin before anything else
            dtype: output array dtype
        """
        self._batch = batch
        self._scale = (height, width)
        self._channels = channels
        self._pad = pad
        self._valid_norm = valid_norm
        self._force_binarization = force_binarization
        self._dtype = dtype
        self._configure()

    def _configure(self) -> None:
        height, width = self._scale
        self._center_norm = False
        self._mode = 'RGB' if self._channels == 3 else 'L'
        if height == 1 and width == 0 and self._channels > 3:
            self._perm = (1, 0, 2)
            self._scale = (self._channels, 0)
            self._channels = 1
            if self._valid_norm:
                self._center_norm = True
            self._mode = 'L'
        elif height > 1 and width == 0 and self._channels in (1, 3):
            self._perm = (0, 1, 2)
            if self._valid_norm and self._channels == 1:
                self._center_norm = True
        elif height == 0 and width > 1 and self._channels in (1, 3):
            self._perm = (0, 1, 2)
        elif height > 0 and width > 0 and self._channels in (1, 3):
            self._perm = (0, 1, 2)
            self._pad = 0
        elif height == 0 and width == 0 and self._channels in (1, 3):
            self._perm = (0, 1, 2)
            self._pad = 0
        else:
            raise KrakenInputException(
                f'Invalid input spec {self._batch}, {height}, {width}, {self._channels}, {self._pad}.')
        if self._mode != 'L' and self._force_binarization:
            raise KrakenInputException('Forced binarization requires grayscale input spec.')
        self._lnorm = CenterNormalizer(self._scale[0]) if self._center_norm else None

    # --------------------------------------------------------------- apply
    def __call__(self, im: Image.Image) -> np.ndarray:
        im = im.convert(self._mode)
        if self._force_binarization:
            from kraken_tpu.binarization import nlbin
            im = nlbin(im)
        if self._scale != (0, 0):
            if self._center_norm:
                im = dewarp(self._lnorm, im)
                im = im.convert(self._mode)
            else:
                # _fixed_resize handles both the fixed-size and the
                # one-free-dimension cases (and routes 'L' images through
                # the byte-exact native Lanczos)
                im = _fixed_resize(im, self._scale)
        return self.tail(im)

    def tail(self, im: Image.Image) -> np.ndarray:
        """
        Pad/to-array/normalize stages only, for callers that already hold the
        mode-converted and resized image (e.g. the segmentation path, which
        needs the scaled grayscale page anyway and avoids resizing twice).
        """
        if self._pad:
            pad = self._pad
            if isinstance(pad, numbers.Number):
                l = t = r = b = int(pad)
            elif len(pad) == 2:
                l = r = int(pad[0])
                t = b = int(pad[1])
            else:
                l, t, r, b = (int(x) for x in pad)
            padded = Image.new(im.mode, (im.width + l + r, im.height + t + b), 255 if im.mode != 'RGB' else (255, 255, 255))
            padded.paste(im, (l, t))
            im = padded
        arr = np.asarray(im)
        if arr.ndim == 2:
            arr = arr[None, :, :]
        else:
            arr = arr.transpose(2, 0, 1)
        if self._dtype == np.uint8:
            # integer fast path for byte device uploads: max-arr on uint8 is
            # bit-identical to round(clip(max/255 - arr/255, 0, 1)*255), so
            # the device (which divides by 255 after transfer) sees exactly
            # the float pipeline's quantized payload without three float
            # full-array passes per line
            arr = arr.max() - arr
        else:
            arr = arr.astype(self._dtype) / 255.0
            arr = arr.max() - arr
        return np.transpose(arr, self._perm)

    # ---------------------------------------------------------- properties
    @property
    def batch(self) -> int:
        return self._batch

    @batch.setter
    def batch(self, batch: int) -> None:
        self._batch = batch

    @property
    def channels(self) -> int:
        if self._channels not in (1, 3) and self._scale[0] == self._channels:
            return 1
        return self._channels

    @channels.setter
    def channels(self, channels: int) -> None:
        self._channels = channels
        self._configure()

    @property
    def height(self) -> int:
        if self._scale == (1, 0) and self.channels > 3:
            return self._channels
        return self._scale[0]

    @height.setter
    def height(self, height: int) -> None:
        self._scale = (height, self._scale[1])
        self._configure()

    @property
    def width(self) -> int:
        return self._scale[1]

    @width.setter
    def width(self, width: int) -> None:
        self._scale = (self._scale[0], width)
        self._configure()

    @property
    def mode(self) -> str:
        return self._mode if not self._force_binarization else '1'

    @property
    def scale(self) -> tuple[int, int]:
        if self._scale == (1, 0) and self.channels > 3:
            return (self._channels, self._scale[1])
        return self._scale

    @scale.setter
    def scale(self, scale: tuple[int, int]) -> None:
        self._scale = scale
        self._configure()

    @property
    def pad(self):
        return self._pad

    @pad.setter
    def pad(self, pad) -> None:
        if not isinstance(pad, (numbers.Number, tuple, list)):
            raise TypeError('Unsupported padding argument')
        self._pad = pad
        self._configure()

    @property
    def valid_norm(self) -> bool:
        return self._valid_norm

    @valid_norm.setter
    def valid_norm(self, valid_norm: bool) -> None:
        self._valid_norm = valid_norm
        self._configure()

    @property
    def centerline_norm(self) -> bool:
        return self._center_norm

    @property
    def force_binarization(self) -> bool:
        return self._force_binarization

    @force_binarization.setter
    def force_binarization(self, force_binarization: bool) -> None:
        self._force_binarization = force_binarization
        self._configure()
