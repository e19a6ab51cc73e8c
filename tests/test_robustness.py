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
