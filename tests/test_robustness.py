"""
Robustness: degenerate inputs must not crash the engines.
"""
import dataclasses

import numpy as np
import pytest
from PIL import Image

from kraken_tpu.configs import RecognitionInferenceConfig
from kraken_tpu.containers import BaselineLine, BBoxLine, Segmentation
from kraken_tpu.models import load_models
from kraken_tpu.serialization import serialize


@pytest.fixture
def overfit_line(resources):
    return Image.open(resources / '000236.png')


def test_empty_segmentation_recognition(resources, overfit_line):
    model = load_models(resources / 'overfit.mlmodel')[0]
    model.prepare_for_inference(RecognitionInferenceConfig(num_line_workers=0))
    seg = Segmentation(type='bbox', imagename='x', text_direction='horizontal-lr',
                       script_detection=False, lines=[])
    assert list(model.predict(overfit_line, seg)) == []


def test_empty_segmentation_serialization():
    seg = Segmentation(type='baselines', imagename='x',
                       text_direction='horizontal-lr', script_detection=False,
                       lines=[])
    for tpl in ('alto', 'pagexml', 'hocr', 'abbyyxml'):
        out = serialize(seg, image_size=(100, 100), template=tpl)
        assert out


def test_degenerate_bbox_line(resources, overfit_line):
    """Zero-area boxes produce empty records instead of crashing."""
    model = load_models(resources / 'overfit.mlmodel')[0]
    model.prepare_for_inference(RecognitionInferenceConfig(num_line_workers=0))
    seg = Segmentation(type='bbox', imagename='x', text_direction='horizontal-lr',
                       script_detection=False,
                       lines=[BBoxLine(id='z', bbox=[5, 5, 5, 5])])
    records = list(model.predict(overfit_line, seg))
    assert len(records) == 1
    assert records[0].prediction == ''


def test_very_wide_line(resources):
    """Lines wider than the base bucket ladder still recognize."""
    model = load_models(resources / 'overfit.mlmodel')[0]
    model.prepare_for_inference(RecognitionInferenceConfig(num_line_workers=0))
    im = Image.fromarray(np.random.RandomState(0).randint(200, 255, (60, 4000), np.uint8))
    seg = Segmentation(type='bbox', imagename='x', text_direction='horizontal-lr',
                       script_detection=False,
                       lines=[BBoxLine(id='w', bbox=[0, 0, 4000, 60])])
    records = list(model.predict(im, seg))
    assert len(records) == 1


def test_single_point_baseline(resources, overfit_line):
    model = load_models(resources / 'overfit.mlmodel')[0]
    model.prepare_for_inference(RecognitionInferenceConfig(num_line_workers=0))
    seg = Segmentation(type='baselines', imagename='x',
                       text_direction='horizontal-lr', script_detection=False,
                       lines=[BaselineLine(id='p', baseline=[[10, 10], [10, 10]],
                                           boundary=[[9, 9], [11, 9], [11, 11], [9, 11]])])
    records = list(model.predict(overfit_line, seg))
    assert len(records) == 1
    assert records[0].prediction == ''


# ------------------------- line extraction geometry (cv2-backed warps)
def test_rotate_image_identity_exact():
    """Angle-0 rotation through the cv2 inverse-map affine is byte-exact
    (pins the golden-decode invariant: straight horizontal baselines must
    not be resampled)."""
    import numpy as np
    from PIL import Image
    from kraken_tpu.lib.geometry import _rotate_image
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, (64, 200), np.uint8)
    im = Image.fromarray(arr, 'L')
    out = _rotate_image(im, 0.0, cval=0, order=1)
    np.testing.assert_array_equal(np.asarray(out), arr)


def test_rotate_image_cv2_matches_pil_fallback():
    """The cv2 inverse-map path ('L' mode) and the PIL AFFINE fallback
    ('I' mode) implement the same output-to-input mapping: at an exact
    90-degree angle both produce the same geometry (same shapes, pixels
    within 1 LSB — PIL's 'I'-mode float filtering vs cv2's uint8
    fixed-point rounding)."""
    import numpy as np
    from PIL import Image
    from kraken_tpu.lib.geometry import _rotate_image
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (40, 90), np.uint8)
    out_cv = np.asarray(_rotate_image(Image.fromarray(arr, 'L'), np.pi / 2,
                                      cval=0, order=1))
    out_pil = np.asarray(_rotate_image(Image.fromarray(arr.astype(np.int32), 'I'),
                                       np.pi / 2, cval=0, order=1))
    assert out_cv.shape == out_pil.shape == (90, 40)
    assert np.abs(out_cv.astype(int) - out_pil.astype(int)).max() <= 1


def test_rotate_image_small_angle_content():
    """Small-angle rotation preserves mass approximately and pads with
    cval outside the original support."""
    import numpy as np
    from PIL import Image
    from kraken_tpu.lib.geometry import _rotate_image
    arr = np.full((50, 300), 200, np.uint8)
    out = np.asarray(_rotate_image(Image.fromarray(arr, 'L'), 0.03,
                                   cval=0, order=1))
    assert out.shape[0] > 50 and out.shape[1] >= 300
    assert abs(float((out > 0).sum()) - arr.size) / arr.size < 0.05


def test_piecewise_affine_warp_straightens_curve():
    """The legacy Delaunay warp maps a bright curved band onto a straight
    one: after warping, the band's row extent collapses toward the
    destination baseline."""
    import numpy as np
    from kraken_tpu.lib.geometry import _piecewise_affine_warp
    h, w = 80, 200
    patch = np.zeros((h, w), np.uint8)
    xs = np.arange(w)
    curve = (40 + 15 * np.sin(xs / w * np.pi)).astype(int)
    for x, y in zip(xs, curve):
        patch[max(0, y - 3):y + 3, x] = 255
    # source points follow the curve, destinations are the flat line y=40
    src = np.array([[x, 40 + 15 * np.sin(x / w * np.pi)] for x in range(0, w + 1, 20)]
                   + [[x, 10 + 15 * np.sin(x / w * np.pi)] for x in range(0, w + 1, 20)]
                   + [[x, 70 + 15 * np.sin(x / w * np.pi)] for x in range(0, w + 1, 20)])
    dst = np.array([[x, 40] for x in range(0, w + 1, 20)]
                   + [[x, 10] for x in range(0, w + 1, 20)]
                   + [[x, 70] for x in range(0, w + 1, 20)], float)
    out = _piecewise_affine_warp(patch, src.astype(float), dst, (h, w), order=1)
    assert out.shape == (h, w)
    rows = np.nonzero(out.max(axis=1) > 128)[0]
    assert len(rows) > 0
    # straightened band hugs y=40 instead of spanning 22..58
    assert rows.min() >= 33 and rows.max() <= 47
