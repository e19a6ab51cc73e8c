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


def _sato_kernel_bank(sigmas: tuple):
    """
    Row/column kernel banks for every (sigma, Hessian component) pair,
    zero-padded to a common radius. Padding a gaussian-derivative kernel
    with zeros is exact: the extra taps multiply the same constant-zero
    border the narrower kernel's padding would read.

    Per sigma the three Hessian maps need the separable pairs
    (row, col) = (g0, g2) for hxx, (g2, g0) for hyy, (g1, g1) for hxy.
    """
    radius = max(int(4 * s + 0.5) for s in sigmas)
    width = 2 * radius + 1

    def padded(sigma, order):
        k = _gauss_deriv_kernel(sigma, order)
        pad = (width - len(k)) // 2
        return np.pad(k, (pad, pad))

    rows, cols = [], []
    for sigma in sigmas:
        for r_ord, c_ord in ((0, 2), (2, 0), (1, 1)):
            rows.append(padded(sigma, r_ord))
            cols.append(padded(sigma, c_ord))
    return (np.stack(rows).astype(np.float32),
            np.stack(cols).astype(np.float32), radius)


@functools.partial(jax.jit, static_argnames=('sigmas',))
def _sato_core_batch(im: jnp.ndarray, sigmas: tuple = (1, 3, 5, 7, 9)) -> jnp.ndarray:
    """
    Sato ridge response of a (N, H, W) stack in TWO convolutions: a row
    pass producing all 3·len(sigmas) Hessian intermediates as channels and
    a grouped column pass completing the separable filters. Identical
    results to the per-sigma formulation (zero-padded kernel equivalence),
    but ~30x fewer conv ops to compile — the per-sigma variant takes
    minutes to build on some backends.
    """
    rows, cols, radius = _sato_kernel_bank(sigmas)
    k = rows.shape[0]
    img = im.astype(jnp.float32)[:, None]                     # (N, 1, H, W)
    x = jax.lax.conv_general_dilated(
        img, jnp.asarray(rows)[:, None, :, None],             # (K, 1, w, 1)
        (1, 1), [(radius, radius), (0, 0)],
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        precision=jax.lax.Precision.HIGHEST)                  # (N, K, H, W)
    x = jax.lax.conv_general_dilated(
        x, jnp.asarray(cols)[:, None, None, :],               # (K, 1, 1, w)
        (1, 1), [(0, 0), (radius, radius)],
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        feature_group_count=k,
        precision=jax.lax.Precision.HIGHEST)                  # (N, K, H, W)
    response = jnp.zeros_like(img[:, 0])
    for i, sigma in enumerate(sigmas):
        s2 = float(sigma ** 2)
        hxx = x[:, 3 * i] * s2
        hyy = x[:, 3 * i + 1] * s2
        hxy = x[:, 3 * i + 2] * s2
        tmp = jnp.sqrt((hyy - hxx) ** 2 + 4 * hxy ** 2)
        low = 0.5 * (hyy + hxx - tmp)
        response = jnp.maximum(response, jnp.where(low < 0, -low, 0))
    return response


def _sato_core(im: jnp.ndarray, sigmas: tuple = (1, 3, 5, 7, 9)) -> jnp.ndarray:
    """Sato ridge response of one (H, W) map (see _sato_core_batch)."""
    return _sato_core_batch(im[None], sigmas)[0]


def sato_ridge_device(im: np.ndarray, sigmas=(1, 3, 5, 7, 9),
                      black_ridges: bool = False) -> np.ndarray:
    """Jitted Sato ridge filter over a (H, W) float map."""
    arr = jnp.asarray(im, jnp.float32)
    if black_ridges:
        arr = -arr
    return np.asarray(_sato_core(arr, tuple(sigmas)))
