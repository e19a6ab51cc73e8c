"""
Device-resident line extraction (inference.extraction): the gather-warp
that cuts/dewarps/resizes lines inside the recognition forward jit must
reproduce the host extraction path's decodes on the golden fixtures —
the equivalence contract pinned in the module docstring
(kraken_tpu/inference/extraction.py; host analog being replaced:
/root/reference/kraken/lib/segmentation.py:1424 extract_polygons +
/root/reference/kraken/lib/vgsl/rpred.py:103 line pool).
"""
import dataclasses
import warnings

import numpy as np
import pytest
from PIL import Image

from kraken_tpu.configs import RecognitionInferenceConfig
from kraken_tpu.containers import BaselineLine, BBoxLine, Segmentation
from kraken_tpu.models import load_models

BL_GOLD = '.ܗ ܣܗܐ  ܕ ܣ   ܗ ܕܗܗ ܟܕܗܣ    ܠ  ܐ .ܣܕܐܣ. ܗ '


@pytest.fixture(scope='module', autouse=True)
def quiet():
    warnings.filterwarnings('ignore', category=DeprecationWarning)
    warnings.filterwarnings('ignore', category=UserWarning)


@pytest.fixture(scope='module')
def overfit_line(resources):
    return Image.open(resources / '000236.png')


@pytest.fixture
def bl_seg(resources):
    return Segmentation(type='baselines', imagename=resources / 'bw.png',
                        text_direction='horizontal-lr', script_detection=False,
                        lines=[BaselineLine(id='foo',
                                            baseline=[[0, 10], [2543, 10]],
                                            boundary=[[0, 0], [2543, 0],
                                                      [2543, 155], [0, 155]])])


def _predict(resources, model_file, im, seg, **cfg):
    # padding=1: the reference goldens were produced with pad=True (1px)
    vmodel = load_models(resources / model_file)[0]
    vmodel.prepare_for_inference(RecognitionInferenceConfig(
        num_line_workers=0, batch_size=8, padding=1, **cfg))
    return vmodel, list(vmodel.predict(im, seg))


def test_device_extraction_straight_line_golden(resources, overfit_line, bl_seg):
    """Straight 2-point baseline (the affine derotation branch) reproduces
    the pinned golden decode bit-for-bit."""
    vmodel, records = _predict(resources, 'overfit.mlmodel', overfit_line,
                               bl_seg, line_extraction='device')
    assert vmodel._rec_fwd_extract is not None
    assert records[0].prediction == BL_GOLD


def test_device_extraction_matches_host_arabic(resources):
    """The 24 curved baselines of the Arabic fixture page (piecewise mesh
    warp, the mainline new-polygon branch): device extraction must produce
    the same decodes and near-identical confidences as the host extractor."""
    from tests.test_serialization import load_ref_pickle
    full_seg = load_ref_pickle(resources / 'arabic_seg.pkl')
    seg = Segmentation(type='baselines', imagename=full_seg.imagename,
                       lines=full_seg.lines, text_direction='horizontal-lr',
                       script_detection=False)
    im = Image.open(resources / 'arabic.webp')
    _, host = _predict(resources, 'overfit_bl_newpoly.safetensors', im, seg,
                       line_extraction='host')
    vmodel, dev = _predict(resources, 'overfit_bl_newpoly.safetensors', im, seg,
                           line_extraction='device')
    assert vmodel._rec_fwd_extract is not None
    assert len(dev) == len(host) == 24
    assert [r.prediction for r in dev] == [r.prediction for r in host]
    for d, h in zip(dev, host):
        if len(d.confidences) and len(h.confidences):
            assert float(np.mean(d.confidences)) == \
                pytest.approx(float(np.mean(h.confidences)), abs=0.05)


def test_device_extraction_legacy_polygons_matches_host(resources):
    """Models trained with the legacy (Delaunay piecewise-affine) extractor
    keep their extractor on the device path and match the host decodes."""
    from tests.test_serialization import load_ref_pickle
    full_seg = load_ref_pickle(resources / 'arabic_seg.pkl')
    seg = Segmentation(type='baselines', imagename=full_seg.imagename,
                       lines=full_seg.lines[:8], text_direction='horizontal-lr',
                       script_detection=False)
    im = Image.open(resources / 'arabic.webp')
    vmodel, host = _predict(resources, 'overfit_bl.safetensors', im, seg,
                            line_extraction='host')
    assert vmodel.use_legacy_polygons
    _, dev = _predict(resources, 'overfit_bl.safetensors', im, seg,
                      line_extraction='device')
    assert [r.prediction for r in dev] == [r.prediction for r in host]


def test_device_extraction_bbox_falls_back_to_host(resources, overfit_line):
    """bbox segmentations (centerline-normalized transform regime) are not
    covered by the gather-warp: predict must transparently ride the host
    path and still produce the golden decode."""
    seg = Segmentation(type='bbox', imagename=resources / 'bw.png',
                       text_direction='horizontal-lr', script_detection=False,
                       lines=[BBoxLine(id='foo', bbox=[0, 0, 2544, 156])])
    vmodel, records = _predict(resources, 'overfit.mlmodel', overfit_line,
                               seg, line_extraction='device')
    from kraken_tpu.inference.extraction import supports_device_extraction
    assert not supports_device_extraction(vmodel, vmodel._inf_config, 'bbox')
    assert records[0].prediction == 'ܡ ܘܡ ܗ ܡܕܐ ܐ ܐܐ ܡ ܗܗܐܐܐܕ'


def test_device_extraction_bitonal_passthrough(resources, bl_seg):
    """Bitonal pages resample order-0 on the host; the device path must
    route them through the identity-grid pass-through and still match the
    host decode exactly."""
    im = Image.open(resources / 'bw.png').convert('1')
    _, host = _predict(resources, 'overfit.mlmodel', im, bl_seg,
                       line_extraction='host')
    _, dev = _predict(resources, 'overfit.mlmodel', im, bl_seg,
                      line_extraction='device')
    assert [r.prediction for r in dev] == [r.prediction for r in host]


def test_device_extraction_invalid_lines_yield_empty_records(resources, overfit_line):
    """Out-of-bounds/degenerate lines produce empty records (same failure
    isolation as the host engine), in order, without aborting the batch."""
    lines = [BaselineLine(id='bad', baseline=[[0, 10], [4000, 10]],
                          boundary=[[0, 0], [4000, 0], [4000, 155], [0, 155]]),
             BaselineLine(id='good', baseline=[[0, 10], [2543, 10]],
                          boundary=[[0, 0], [2543, 0], [2543, 155], [0, 155]])]
    seg = Segmentation(type='baselines', imagename=resources / 'bw.png',
                       text_direction='horizontal-lr', script_detection=False,
                       lines=lines)
    _, records = _predict(resources, 'overfit.mlmodel', overfit_line, seg,
                          line_extraction='device')
    assert len(records) == 2
    assert records[0].prediction == ''
    assert records[1].prediction == BL_GOLD


def test_device_extraction_return_line_image_falls_back(resources, overfit_line, bl_seg):
    """return_line_image needs host pixels: the gate must disable device
    extraction and the host path must still deliver the line image."""
    vmodel, records = _predict(resources, 'overfit.mlmodel', overfit_line,
                               bl_seg, line_extraction='device',
                               return_line_image=True)
    from kraken_tpu.inference.extraction import supports_device_extraction
    assert not supports_device_extraction(vmodel, vmodel._inf_config, 'baselines')
    assert records[0].prediction == BL_GOLD
    assert records[0].image is not None
