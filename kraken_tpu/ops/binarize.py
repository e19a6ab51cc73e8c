"""
kraken_tpu.ops.binarize
~~~~~~~~~~~~~~~~~~~~~~~

Device-side nlbin adaptive binarization: the full algorithm of
kraken_tpu.binarization.nlbin expressed as one jitted XLA program —
background estimation via zoomed percentile filters, flattening, text-region
variance masking, masked percentile thresholds, and final thresholding all
run on the TPU; only the final bitonal map returns to the host.
(Behavioral ancestor: reference kraken/binarization.py:44-127 — host-only
scipy; this device path has no reference equivalent.)

Percentile filters are computed as windowed shifted stacks + quantile
reductions; masked percentiles use a sort with invalid lanes pushed to +inf
and a dynamic rank gather, keeping all shapes static.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['nlbin_device', 'nlbin_batch']


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _gaussian_filter(im: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable gaussian blur with reflect padding (scipy-compatible)."""
    radius = int(4 * sigma + 0.5)
    if radius < 1:
        return im
    k = jnp.asarray(_gaussian_kernel1d(sigma, radius))
    pad = [(radius, radius), (0, 0)]
    x = jnp.pad(im, pad, mode='reflect')
    x = jax.lax.conv_general_dilated(x[None, None], k[None, None, :, None],
                                     (1, 1), 'VALID',
                                     dimension_numbers=('NCHW', 'OIHW', 'NCHW'))[0, 0]
    x = jnp.pad(x, [(0, 0), (radius, radius)], mode='reflect')
    x = jax.lax.conv_general_dilated(x[None, None], k[None, None, None, :],
                                     (1, 1), 'VALID',
                                     dimension_numbers=('NCHW', 'OIHW', 'NCHW'))[0, 0]
    return x


def _window_percentile(im: jnp.ndarray, perc: float, size: tuple[int, int]) -> jnp.ndarray:
    """Sliding-window percentile via a stacked shifted-copy quantile."""
    sh, sw = size
    pad_h = (sh - 1) // 2, sh - 1 - (sh - 1) // 2
    pad_w = (sw - 1) // 2, sw - 1 - (sw - 1) // 2
    padded = jnp.pad(im, [pad_h, pad_w], mode='reflect')
    h, w = im.shape
    windows = jnp.stack([padded[dy:dy + h, dx:dx + w]
                         for dy in range(sh) for dx in range(sw)])
    return jnp.percentile(windows, perc, axis=0)


def _masked_percentile(values: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """Percentile of values where mask, with static shapes."""
    flat = jnp.where(mask.ravel(), values.ravel(), jnp.inf)
    sorted_vals = jnp.sort(flat)
    count = jnp.sum(mask)
    # linear-interpolated rank like np.percentile
    rank = (count - 1) * (q / 100.0)
    lo = jnp.clip(jnp.floor(rank).astype(jnp.int32), 0, flat.size - 1)
    hi = jnp.clip(lo + 1, 0, flat.size - 1)
    frac = rank - lo
    v_lo = sorted_vals[lo]
    v_hi = jnp.where(hi < count, sorted_vals[hi], v_lo)
    return v_lo + frac * (v_hi - v_lo)


def _binary_dilation_rect(mask: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    return jax.lax.reduce_window(mask.astype(jnp.float32), 0.0, jax.lax.max,
                                 (size[0], size[1]), (1, 1), 'SAME') > 0


@functools.partial(jax.jit, static_argnames=('zoom', 'perc', 'range_',
                                             'escale', 'border'))
def _nlbin_core(image: jnp.ndarray,
                threshold: float = 0.5,
                zoom: float = 0.5,
                escale: float = 1.0,
                border: float = 0.1,
                perc: int = 80,
                range_: int = 20,
                low: float = 5,
                high: float = 90) -> jnp.ndarray:
    image = image - jnp.amin(image)
    image = image / jnp.maximum(jnp.amax(image), 1e-9)
    h, w = image.shape
    # background estimation on a zoomed copy
    zh, zw = max(1, int(h * zoom)), max(1, int(w * zoom))
    m = jax.image.resize(image, (zh, zw), method='bilinear')
    m = _window_percentile(m, perc, (range_, 2))
    m = _window_percentile(m, perc, (2, range_))
    m = jax.image.resize(m, (h, w), method='bilinear')
    flat = jnp.clip(image - m + 1, 0, 1)

    # estimate thresholds over high-variance (text) regions of the interior
    o0, o1 = int(border * h), int(border * w)
    est = flat[o0:h - o0, o1:w - o1]
    v = est - _gaussian_filter(est, escale * 20.0)
    v = jnp.sqrt(_gaussian_filter(v ** 2, escale * 20.0))
    v = v > 0.3 * jnp.amax(v)
    v = _binary_dilation_rect(v, (int(escale * 50), 1))
    v = _binary_dilation_rect(v, (1, int(escale * 50)))
    lo = _masked_percentile(est, v, low)
    hi = _masked_percentile(est, v, high)
    flat = jnp.clip((flat - lo) / (hi - lo), 0, 1)
    return flat > threshold


def nlbin_device(im: np.ndarray, threshold: float = 0.5, zoom: float = 0.5,
                 escale: float = 1.0, border: float = 0.1, perc: int = 80,
                 range: int = 20, low: int = 5, high: int = 90) -> np.ndarray:
    """
    Jitted nlbin over a (H, W) grayscale uint8/float array. Returns a boolean
    array (True = foreground paper/white like the host nlbin's 255).
    """
    arr = jnp.asarray(im, jnp.float32)
    if arr.max() > 1.5:
        arr = arr / 255.0
    return np.asarray(_nlbin_core(arr, threshold=threshold, zoom=zoom,
                                  escale=escale, border=border, perc=perc,
                                  range_=range, low=low, high=high))


def nlbin_batch(ims: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """vmapped nlbin over a (N, H, W) page batch."""
    core = functools.partial(_nlbin_core, **kwargs)
    return jax.vmap(core)(jnp.asarray(ims, jnp.float32))
