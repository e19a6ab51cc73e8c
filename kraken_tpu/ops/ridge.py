"""
kraken_tpu.ops.ridge
~~~~~~~~~~~~~~~~~~~~

Device-side Sato ridge filter: the multi-scale Hessian eigenvalue analysis
of kraken_tpu.lib.vectorization.sato_ridge expressed as separable gaussian
derivative convolutions under jit. This is the hottest host step of baseline
vectorization (≈1.6 s per 1800px page with scipy); on device it collapses
into a handful of fused convolutions.
(Behavioral ancestor: reference kraken/lib/segmentation.py:316-340 sato
usage via skimage; this device path has no reference equivalent.)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['sato_ridge_device']


def _gauss_deriv_kernel(sigma: float, order: int) -> np.ndarray:
    """1D gaussian (derivative) kernel matching scipy.ndimage conventions."""
    radius = int(4 * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * (x / sigma) ** 2)
    phi /= phi.sum()
    if order == 0:
        return phi.astype(np.float32)
    if order == 1:
        return (-x / sigma ** 2 * phi).astype(np.float32)
    if order == 2:
        return ((x ** 2 / sigma ** 4 - 1 / sigma ** 2) * phi).astype(np.float32)
    raise ValueError(order)


def _sep_conv(im: jnp.ndarray, kr: np.ndarray, kc: np.ndarray) -> jnp.ndarray:
    """Separable 2D convolution with constant (zero) padding."""
    rr = len(kr) // 2
    rc = len(kc) // 2
    x = im[None, None]
    # full f32 accumulation: TPU convs default to bf16 passes, which shifts
    # near-threshold ridge responses relative to the host filter
    x = jax.lax.conv_general_dilated(x, jnp.asarray(kr)[None, None, :, None],
                                     (1, 1), [(rr, rr), (0, 0)],
                                     dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
                                     precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(x, jnp.asarray(kc)[None, None, None, :],
                                     (1, 1), [(0, 0), (rc, rc)],
                                     dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
                                     precision=jax.lax.Precision.HIGHEST)
    return x[0, 0]


@functools.partial(jax.jit, static_argnames=('sigmas',))
def _sato_core(im: jnp.ndarray, sigmas: tuple = (1, 3, 5, 7, 9)) -> jnp.ndarray:
    img = im.astype(jnp.float32)
    response = jnp.zeros_like(img)
    for sigma in sigmas:
        g0 = _gauss_deriv_kernel(sigma, 0)
        g1 = _gauss_deriv_kernel(sigma, 1)
        g2 = _gauss_deriv_kernel(sigma, 2)
        s2 = sigma ** 2
        hxx = _sep_conv(img, g0, g2) * s2
        hyy = _sep_conv(img, g2, g0) * s2
        hxy = _sep_conv(img, g1, g1) * s2
        tmp = jnp.sqrt((hyy - hxx) ** 2 + 4 * hxy ** 2)
        low = 0.5 * (hyy + hxx - tmp)
        response = jnp.maximum(response, jnp.where(low < 0, -low, 0))
    return response


def sato_ridge_device(im: np.ndarray, sigmas=(1, 3, 5, 7, 9),
                      black_ridges: bool = False) -> np.ndarray:
    """Jitted Sato ridge filter over a (H, W) float map."""
    arr = jnp.asarray(im, jnp.float32)
    if black_ridges:
        arr = -arr
    return np.asarray(_sato_core(arr, tuple(sigmas)))
