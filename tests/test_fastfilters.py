"""
Parity of the cv2-backed separable filters with scipy.ndimage. These back
the page-segmentation hot paths (pageseg gradient maps, sato ridge Hessians,
seam-carve energy maps), so equivalence with scipy — which defines reference
behavior — is load-bearing.
"""
import numpy as np
import pytest
from scipy import ndimage as ndi

from kraken_tpu.lib import fastfilters as ff

pytestmark = pytest.mark.skipif(not ff._HAS_CV2, reason='cv2 unavailable')

rng = np.random.RandomState(42)
IMG = rng.rand(257, 181)


@pytest.mark.parametrize('sigma', [(3.0, 1.5), (0.9, 6.3), (12.0, 12.0), 2.0])
@pytest.mark.parametrize('order', [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (2, 2)])
@pytest.mark.parametrize('mode', ['reflect', 'constant', 'mirror', 'nearest'])
def test_gaussian_parity(sigma, order, mode):
    a = ndi.gaussian_filter(IMG, sigma, order=order, mode=mode)
    b = ff.gaussian_filter(IMG, sigma, order=order, mode=mode)
    assert np.abs(a - b).max() < 1e-12


def test_gaussian_float32_stays_float32():
    out = ff.gaussian_filter(IMG.astype(np.float32), 2.0)
    assert out.dtype == np.float32
    ref = ndi.gaussian_filter(IMG.astype(np.float32), 2.0)
    assert np.abs(out - ref).max() < 1e-5


@pytest.mark.parametrize('size', [(3, 3), (4, 7), (15, 1), (1, 22), (8, 8), 5])
def test_uniform_parity(size):
    a = ndi.uniform_filter(IMG, size)
    b = ff.uniform_filter(IMG, size)
    assert np.abs(a - b).max() < 1e-12


@pytest.mark.parametrize('size', [(3, 3), (4, 7), (15, 1), (1, 22), (2, 2), (40, 3), 20])
def test_maximum_parity(size):
    assert (ndi.maximum_filter(IMG, size) == ff.maximum_filter(IMG, size)).all()
    mask = IMG > 0.7
    assert (ndi.maximum_filter(mask, size) == ff.maximum_filter(mask, size)).all()


def test_float_size_like_scipy_caller():
    # pageseg passes float sizes (e.g. 5.0*scale); scipy truncates to int
    a = ndi.uniform_filter(IMG, (5, 1))
    b = ff.uniform_filter(IMG, (5.9, 1.2))
    assert np.abs(a - b).max() < 1e-12


def test_fallback_modes_delegate_to_scipy():
    # unsupported configurations must still produce scipy results
    a = ndi.uniform_filter(IMG, 4, mode='constant', cval=1.0)
    b = ff.uniform_filter(IMG, 4, mode='constant', cval=1.0)
    assert np.abs(a - b).max() == 0
    a = ndi.gaussian_filter(IMG, 2.0, order=3)
    b = ff.gaussian_filter(IMG, 2.0, order=3)
    assert np.abs(a - b).max() == 0


@pytest.mark.parametrize('sigma,order', [((4.8, 96.0), (1, 0)),
                                         ((96.0, 4.8), (0, 1)),
                                         ((70.0, 70.0), (0, 0)),
                                         # order-1 on the >255-tap axis:
                                         # antisymmetric kernels catch any
                                         # orientation flip in the FFT pass
                                         ((4.8, 96.0), (0, 1)),
                                         ((96.0, 4.8), (1, 0)),
                                         ((96.0, 96.0), (1, 2))])
def test_gaussian_fft_path_parity(sigma, order):
    """Kernels beyond _FFT_TAPS take the full-row rfft pass; deviation from
    scipy stays at float64 rounding (measured ~1e-15 of the value range)."""
    a = ndi.gaussian_filter(IMG, sigma, order=order)
    b = ff.gaussian_filter(IMG, sigma, order=order)
    assert np.abs(a - b).max() < 1e-12
