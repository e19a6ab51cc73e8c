"""
Native (C++) page polygonizer tests: rasterization primitives against their
cv2 counterparts, end-to-end polygon agreement with the pure-python
pipeline on the fixture page, and failure semantics. The native path is the
production default (lib/polygonization.py routes through it); the python
path remains the documented fallback, so both are pinned here.
"""
import ctypes

import numpy as np
import pytest
from PIL import Image

from kraken_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native library unavailable')


def _lib():
    lib = native._load()
    lib.dbg_fill_polygon.argtypes = [ctypes.c_int, ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_double),
                                     ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_uint8)]
    lib.dbg_fill_polygon.restype = None
    lib.dbg_largest_contour.argtypes = [ctypes.c_int, ctypes.c_int,
                                        ctypes.POINTER(ctypes.c_uint8),
                                        ctypes.POINTER(ctypes.c_int32),
                                        ctypes.c_int]
    lib.dbg_largest_contour.restype = ctypes.c_int
    return lib


def _poly_iou(a, b, shape):
    import cv2
    if a is None or b is None:
        return float(a is b)
    m1 = np.zeros(shape, np.uint8)
    m2 = np.zeros(shape, np.uint8)
    cv2.fillPoly(m1, [np.asarray(a, np.int32)], 1)
    cv2.fillPoly(m2, [np.asarray(b, np.int32)], 1)
    return (m1 & m2).sum() / max((m1 | m2).sum(), 1)


def test_fill_polygon_matches_cv2():
    """Scanline fill agrees with cv2.fillPoly to >=0.9 IoU on random
    polygons (boundary pixels may differ by one, which dominates the
    ratio only for very thin shapes)."""
    import cv2
    lib = _lib()
    rng = np.random.RandomState(0)
    for _ in range(20):
        h, w = 60, 80
        poly = rng.rand(rng.randint(3, 9), 2) * [w - 1, h - 1]
        pts = np.ascontiguousarray(poly, np.float64)
        out = np.zeros((h, w), np.uint8)
        lib.dbg_fill_polygon(h, w,
                             pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                             len(poly),
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        ref = np.zeros((h, w), np.uint8)
        cv2.fillPoly(ref, [np.round(poly).astype(np.int32)], 1)
        inter = (out & ref).sum()
        union = (out | ref).sum()
        assert inter / max(union, 1) >= 0.9


def test_contour_trace_matches_cv2():
    """The Moore boundary tracer encloses exactly the same pixels as
    cv2.findContours RETR_EXTERNAL on random dilated blobs."""
    import cv2
    lib = _lib()
    rng = np.random.RandomState(1)
    for _ in range(10):
        m = (rng.rand(60, 80) > 0.7).astype(np.uint8)
        m = cv2.dilate(m, np.ones((3, 3), np.uint8))
        buf = np.zeros((100000, 2), np.int32)
        n = lib.dbg_largest_contour(
            m.shape[0], m.shape[1],
            np.ascontiguousarray(m).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), 100000)
        mine = buf[:n]
        cs, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        big = max(cs, key=cv2.contourArea).squeeze(1)
        assert _poly_iou(mine.tolist(), big.tolist(), m.shape) == 1.0


def test_native_agrees_with_python_on_synthetic():
    from kraken_tpu.lib.polygonization import (calculate_polygonal_environment,
                                               gradient_feature_map)
    H, W = 200, 400
    img = np.full((H, W), 255, np.uint8)
    img[38:52, 30:370] = 60
    img[108:122, 40:350] = 60
    im = Image.fromarray(img)
    baselines = [[[30, 52], [370, 52]], [[40, 122], [350, 122]]]
    im_feats = gradient_feature_map(img)
    nat = native.polygonize_page_native(baselines, [[], []], im_feats, False)
    # force the python fallback via raise_on_error (native path is skipped)
    py = calculate_polygonal_environment(im, baselines, raise_on_error=True)
    for p, n in zip(py, nat):
        assert _poly_iou(p, n, (H, W)) >= 0.99


def test_native_agrees_with_python_on_fixture_page(resources):
    """Full-page agreement floor: every baseline polygonizes on both paths
    with high mask overlap (rasterization/warp rounding may differ by
    single pixels; detection quality is separately floored in
    test_seg_parity.py)."""
    from kraken_tpu.configs import SegmentationInferenceConfig
    from kraken_tpu.inference.segmentation import (_compute_segmentation_map,
                                                   prepare_segmentation)
    from kraken_tpu.lib.fastfilters import maximum_filter
    from kraken_tpu.lib.polygonization import (calculate_polygonal_environment,
                                               gradient_feature_map)
    from kraken_tpu.lib.vectorization import vectorize_lines
    from kraken_tpu.models import load_models

    im = Image.open(resources / '170025120000003,0074.jpg')
    model = load_models(resources / 'blla_small.safetensors')[0]
    prepare_segmentation(model, SegmentationInferenceConfig(precision='32-true'))
    rets = _compute_segmentation_map(model, im)
    cm, heat = rets['cls_map'], rets['heatmap']
    st, en = cm['aux']['_start_separator'], cm['aux']['_end_separator']
    sep = (maximum_filter(heat[st], 20), maximum_filter(heat[en], 20))
    bls = []
    for _, idx in cm['baselines'].items():
        bls += vectorize_lines(heat[(st, en, idx), :, :],
                               text_direction='horizontal', sep_filters=sep,
                               bin_map=rets['bin_maps'].get(idx))
    assert len(bls) >= 40
    im_feats = gradient_feature_map(rets['scal_im'])
    nat = native.polygonize_page_native(bls, [[]] * len(bls), im_feats, False)
    py = [calculate_polygonal_environment(baselines=[bl], im_feats=im_feats,
                                          suppl_obj=[b for j, b in enumerate(bls) if j != i],
                                          topline=False, raise_on_error=True)[0]
          for i, bl in enumerate(bls)]
    ious = [_poly_iou(p, n, im_feats.shape) for p, n in zip(py, nat)]
    assert sum(n is None for n in nat) == 0
    assert np.mean(ious) >= 0.98
    assert np.min(ious) >= 0.85


def test_native_failure_semantics():
    """Degenerate baselines fail per line (None), not per page."""
    im_feats = np.zeros((50, 50), np.float32)
    out = native.polygonize_page_native(
        [[[10, 10], [10, 10]], [[5, 25], [45, 25]]], [[], []], im_feats, False)
    assert out[0] is None
    assert out[1] is not None


def test_device_carver_all_lines_failed():
    """The device seam carver honors per-line failure semantics when EVERY
    line fails native preparation (the empty patch list must not crash the
    batched DP)."""
    from kraken_tpu.lib.polygonization import polygonize_page
    im_feats = np.zeros((50, 50), np.float32)
    jobs = [([[10, 10], [10, 10]], []), ([[5, 5], [5, 5]], [])]
    out = polygonize_page(jobs, im_feats, seam_carver='device')
    assert out == [None, None]


def test_host_and_device_carvers_identical():
    """polygonize_page with the host DP and the device XLA scan return the
    same polygons (shared native preparation/completion; the DPs are
    tie-identical)."""
    from kraken_tpu.lib.polygonization import gradient_feature_map, polygonize_page
    H, W = 200, 400
    img = np.full((H, W), 255, np.uint8)
    for y0 in (38, 78, 108, 148):
        img[y0:y0 + 14, 30:370] = 60
    baselines = [[[30, y + 14], [370, y + 14]] for y in (38, 78, 108, 148)]
    im_feats = gradient_feature_map(img)
    jobs = [(bl, baselines[:i] + baselines[i + 1:]) for i, bl in enumerate(baselines)]
    host = polygonize_page(jobs, im_feats, seam_carver='host')
    dev = polygonize_page(jobs, im_feats, seam_carver='device')
    assert host == dev


def test_sliding_percentile_matches_numpy():
    """The native moving-window percentile (nlbin's background estimator)
    is bit-identical to np.percentile('linear') over the symmetric-padded
    window stack, including pads wider than the array and interpolated
    ranks on either side of t=0.5."""
    from numpy.lib.stride_tricks import sliding_window_view
    rng = np.random.RandomState(0)
    for _ in range(15):
        h, w = rng.randint(5, 100), rng.randint(5, 100)
        arr = rng.rand(h, w)
        win = (int(rng.choice([2, 3, 7, 20])), int(rng.choice([2, 3, 7, 20])))
        q = float(rng.choice([80, 50, 31.7, 5, 95]))
        wh, ww = win
        top, left = (wh - 1) // 2, (ww - 1) // 2
        padded = np.pad(arr, ((top, wh - 1 - top), (left, ww - 1 - left)),
                        mode='symmetric')
        view = sliding_window_view(padded, win)[:, :arr.shape[1]]
        ref = np.percentile(view, q, axis=(-2, -1))
        fast = native.sliding_percentile_native(arr, q, win)
        assert np.array_equal(ref, fast), (win, q)
