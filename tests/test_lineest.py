"""
Centerline estimation / dewarp regression tests: the fast paths in
lib/lineest (banded-matmul + FFT heavy blur, vectorized bilinear
scale_to_h) are pinned against the scipy reference semantics they
replaced — the bbox recognition goldens (tests/test_rpred.py) depend on
byte-stable dewarps.
"""
import numpy as np
import pytest
from PIL import Image
from scipy.ndimage import affine_transform, gaussian_filter

from kraken_tpu.lib.lineest import (CenterNormalizer, _bilinear_diag,
                                    dewarp, scale_to_h)


def test_heavy_blur_tracks_match_scipy():
    """The argmax track of the fast 2-D blur equals scipy's on random
    ink-like lines (values differ only in the last ulp; the unimodal
    profile keeps the argmax stable)."""
    rng = np.random.RandomState(0)
    for _ in range(15):
        h = rng.randint(20, 180)
        w = rng.randint(100, 1500)
        line = (rng.rand(h, w) * (rng.rand(h, w) > 0.9)).astype(np.float64)
        ref = gaussian_filter(line, sigma=(h * 0.5, h * 1.0), mode='constant')
        fast = CenterNormalizer._heavy_blur(line, h * 0.5, h * 1.0)
        assert np.abs(ref - fast).max() < 1e-12
        assert np.array_equal(ref.argmax(axis=0), fast.argmax(axis=0))


def test_bilinear_diag_matches_affine_transform():
    """scale_to_h's vectorized bilinear equals scipy affine_transform
    byte-for-byte at the production float32 dtype, including the
    outside-extent constant fill."""
    rng = np.random.RandomState(1)
    for _ in range(25):
        h = rng.randint(10, 300)
        w = rng.randint(20, 1200)
        img = rng.rand(h, w) * 255
        cval = float(rng.randint(0, 256))
        th = int(rng.choice([48, 120, 20, 7]))
        s = th / h
        ref = affine_transform(img * 1.0, np.full(2, 1.0 / s), order=1,
                               output_shape=(th, int(s * w)),
                               mode='constant', cval=cval).astype('f')
        fast = _bilinear_diag(img * 1.0, 1.0 / s,
                              (th, int(s * w)), cval).astype('f')
        assert np.array_equal(ref, fast)


def test_scale_to_h_shape_and_dtype():
    img = np.random.RandomState(2).rand(60, 300)
    out = scale_to_h(img, 48)
    assert out.shape == (48, 240)
    assert out.dtype == np.dtype('f')


def test_dewarp_real_line(resources):
    """End-to-end PIL dewarp on a real line crop: output height is the
    target, and the ink mass stays centered (the band tracks the text)."""
    im = Image.open(resources / 'bw.png').convert('L')
    box = im.crop((74, 61, 1000, 101))
    cn = CenterNormalizer(48)
    out = np.asarray(dewarp(cn, box))
    assert out.shape[0] == 48
    ink = 255.0 - out
    rows = ink.sum(axis=1)
    center = (rows * np.arange(48)).sum() / max(rows.sum(), 1)
    assert 12 < center < 36


def test_native_bilinear_diag_bitexact():
    """The C++ bilinear_diag kernel (native/lineest.cpp) must be BIT-exact
    against the numpy implementation — same IEEE double expression tree,
    FMA contraction off — across random shapes, scales, and cvals."""
    import numpy as np
    import kraken_tpu.lib.lineest as L
    import kraken_tpu.native as N
    if not N.available():
        import pytest
        pytest.skip('no C++ compiler')
    rng = np.random.RandomState(7)
    for _ in range(15):
        h, w = rng.randint(2, 200), rng.randint(2, 1500)
        img = rng.rand(h, w) * 255
        inv = float(np.exp(rng.uniform(-1.5, 1.5)))
        oh, ow = max(1, int(round(h / inv))), max(1, int(round(w / inv)))
        cval = float(rng.choice([0.0, 255.0]))
        nat = N.bilinear_diag_native(img, inv, (oh, ow), cval)
        lib = N._LIB
        try:
            N._LIB = None     # force the numpy path
            ref = L._bilinear_diag(img, inv, (oh, ow), cval)
        finally:
            N._LIB = lib
        assert nat.shape == ref.shape
        assert np.array_equal(nat, ref)
