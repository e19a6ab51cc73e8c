"""
Legacy bbox page segmenter tests (reference: tests/test_pageseg.py) plus
nlbin binarization tests (reference: tests/test_binarization.py).
"""
import pytest
from PIL import Image

from kraken_tpu.binarization import nlbin
from kraken_tpu.exceptions import KrakenInputException
from kraken_tpu.pageseg import segment


def test_segment_color_rejected(resources):
    with pytest.raises(KrakenInputException):
        with Image.open(resources / 'input.jpg') as im:
            segment(im)


def test_segment_bw(resources):
    with Image.open(resources / 'bw.png') as im:
        seg = segment(im)
        assert seg.type == 'bbox'
        assert seg.imagename == im.filename
        assert abs(len(seg.lines) - 30) <= 5
        for line in seg.lines:
            x0, y0, x1, y1 = line.bbox
            assert 0 < x0 and 0 < y0
            assert x1 < im.size[0] and y1 < im.size[1]


def test_segment_black_colseps(resources):
    with Image.open(resources / 'bw.png') as im:
        seg = segment(im, black_colseps=True)
        assert seg.type == 'bbox'
        assert len(seg.lines) > 10


def test_segment_vertical(resources):
    with Image.open(resources / 'bw.png') as im:
        seg = segment(im, text_direction='vertical-lr')
        assert seg.type == 'bbox'


def test_nlbin_color(resources):
    with Image.open(resources / 'input.jpg') as im:
        out = nlbin(im)
        assert out.mode in ('1', 'L')
        colors = out.getcolors(2)
        assert colors is not None and len(colors) <= 2


def test_nlbin_bitonal_passthrough(resources):
    with Image.open(resources / 'bw.png') as im:
        out = nlbin(im)
        assert out is im


def test_nlbin_empty():
    im = Image.new('L', (100, 100), 128)
    with pytest.raises(KrakenInputException):
        nlbin(im)


def test_segment_text_directions(resources):
    """All four text directions produce structurally valid segmentations."""
    from PIL import Image
    from kraken_tpu.pageseg import segment

    im = Image.open(resources / 'bw.png')
    for direction in ('horizontal-lr', 'horizontal-rl', 'vertical-lr', 'vertical-rl'):
        seg = segment(im, text_direction=direction)
        assert seg.type == 'bbox'
        assert len(seg.lines) > 0
        for line in seg.lines:
            x0, y0, x1, y1 = line.bbox
            assert 0 <= x0 <= x1 <= im.width
            assert 0 <= y0 <= y1 <= im.height


def test_line_seeds_native_parity():
    """C++ line-seed marking is bit-identical to the per-column python
    loop (including the empty fill when a baseline mark sits closer than
    delta to the top edge)."""
    import numpy as np
    from kraken_tpu import native
    if not native.available():
        import pytest
        pytest.skip('no C++ compiler available')
    rng = np.random.RandomState(42)
    for _ in range(5):
        h, w = rng.randint(30, 80), rng.randint(30, 80)
        bmarked = rng.rand(h, w) < 0.05
        tmarked = rng.rand(h, w) < 0.05
        scale = rng.uniform(2, 12)
        delta = max(3, int(scale / 2))
        ref = np.zeros((h, w), 'i')
        for x in range(w):
            transitions = sorted([(y, 1) for y in np.nonzero(bmarked[:, x])[0]] +
                                 [(y, 0) for y in np.nonzero(tmarked[:, x])[0]])[::-1]
            transitions.append((0, 0))
            for ls in range(len(transitions) - 1):
                y0, s0 = transitions[ls]
                if s0 == 0:
                    continue
                ref[y0 - delta:y0, x] = 1
                y1, s1 = transitions[ls + 1]
                if s1 == 0 and (y0 - y1) < 5 * scale:
                    ref[y1:y0, x] = 1
        out = native.line_seeds_native(bmarked, tmarked, delta, 5 * scale)
        np.testing.assert_array_equal(out, ref)


def test_nlbin_fft_path_no_nan(resources):
    """The FFT gaussian pass can ring a few ULPs below zero on the squared
    residual; nlbin must clamp before the sqrt or percentile estimation
    sees NaNs and raises (regression: crashed on the annotated page)."""
    from PIL import Image
    from kraken_tpu.binarization import nlbin
    im = Image.open(resources / '170025120000003,0074.jpg').convert('L')
    im = im.crop((0, 0, 900, 700))
    bw = nlbin(im)
    assert bw.mode in ('1', 'L')
    import numpy as _np
    vals = _np.unique(_np.asarray(bw.convert('L')))
    assert set(vals.tolist()) <= {0, 255}
    assert bw.size == im.size


def test_native_label_find_objects_match_scipy():
    """The native 4-connectivity CCL and bbox scan (native/morphology.cpp)
    must reproduce scipy.ndimage.label (default structure, including the
    raster-first-encounter label numbering) and find_objects exactly."""
    import numpy as np
    from scipy import ndimage
    import kraken_tpu.native as N
    if not N.available():
        import pytest
        pytest.skip('no C++ compiler')
    rng = np.random.RandomState(11)
    for _ in range(12):
        h, w = rng.randint(2, 250), rng.randint(2, 250)
        img = rng.rand(h, w) < rng.uniform(0.2, 0.8)
        lab_n, n_n = N.label4_native(img)
        lab_s, n_s = ndimage.label(img)
        assert n_n == n_s
        assert np.array_equal(lab_n, lab_s)
        assert N.find_objects_native(lab_n) == ndimage.find_objects(lab_s)
        # absent labels emit None, max_label is honored
        holes = lab_s.copy()
        if n_s:
            holes[holes == 1] = 0
        assert N.find_objects_native(holes, n_s) == \
            ndimage.find_objects(holes, n_s)
