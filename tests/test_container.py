"""
Container behavior tests (reference: tests/test_container.py, parts of
test_rpred.py): record iteration/slicing/reordering semantics driven by the
reference's golden Arabic and Latin record pickles.
"""
import numpy as np
import pytest

from kraken_tpu import containers
from tests.test_serialization import load_ref_pickle


@pytest.fixture(scope='module')
def arabic_bl(resources):
    # golden constructor-argument dicts recorded by the reference
    raw = load_ref_pickle(resources / 'arabic_bl_records.pkl')
    return [containers.BaselineOCRRecord(**d) for d in raw]


@pytest.fixture(scope='module')
def arabic_bbox(resources):
    # pickled record objects restore directly into the compatible class
    return load_ref_pickle(resources / 'arabic_bbox_records.pkl')


def test_record_lengths(arabic_bl):
    for rec in arabic_bl:
        assert len(rec) == len(rec.prediction)
        assert len(rec.cuts) == len(rec)
        assert len(rec.confidences) == len(rec)


def test_record_iteration(arabic_bl):
    rec = arabic_bl[0]
    items = list(rec)
    assert len(items) == len(rec)
    for (char, cut, conf), expected in zip(items, rec.prediction):
        assert char == expected
        assert 0 <= conf <= 1


def test_record_indexing(arabic_bl):
    rec = arabic_bl[0]
    char, cut, conf = rec[0]
    assert char == rec.prediction[0]
    char_neg, _, _ = rec[-1]
    assert char_neg == rec.prediction[-1]
    with pytest.raises(IndexError):
        rec[len(rec)]


def test_record_slicing(arabic_bl):
    rec = arabic_bl[0]
    pred, cut, conf = rec[0:4]
    assert pred == rec.prediction[0:4]
    assert isinstance(conf, float)
    # aggregated polygon section is a closed point sequence
    arr = np.array(cut)
    assert arr.ndim == 2 and arr.shape[1] == 2


def test_display_identity(arabic_bl):
    # records are emitted in display order: display_order() is the identity
    rec = arabic_bl[0]
    if rec._display_order:
        assert rec.display_order(None) is rec


def test_logical_reorder_roundtrip(arabic_bl):
    rec = arabic_bl[0]
    logical = rec.logical_order()
    assert sorted(logical.prediction) == sorted(rec.prediction)
    assert logical._display_order != rec._display_order
    back = logical.display_order()
    assert back.prediction == rec.prediction


def test_bbox_record_reorder(arabic_bbox):
    rec = arabic_bbox[0]
    logical = rec.logical_order()
    assert sorted(logical.prediction) == sorted(rec.prediction)
    assert len(logical.cuts) == len(rec.cuts)


def test_bbox_line_casts():
    line = containers.BBoxLine(id='x', bbox=(10, 20, 110, 60))
    bl = line.to_baseline()
    assert bl.type == 'baselines'
    assert bl.boundary[0] == (10, 20)
    assert bl.baseline[0][1] == 20 + (3 * 40) // 4
    back = bl.to_bbox()
    assert tuple(back.bbox) == (10, 20, 110, 60)


def test_baseline_line_casts():
    line = containers.BaselineLine(id='x', baseline=[(0, 50), (100, 50)],
                                   boundary=[(0, 30), (100, 30), (100, 60), (0, 60)])
    bb = line.to_bbox()
    assert tuple(bb.bbox) == (0, 30, 100, 60)


def test_segmentation_json_roundtrip():
    import dataclasses
    import json
    seg = containers.Segmentation(
        type='baselines', imagename='foo.png', text_direction='horizontal-lr',
        script_detection=False,
        lines=[containers.BaselineLine(id='l0', baseline=[(0, 5), (50, 5)],
                                       boundary=[(0, 0), (50, 0), (50, 10), (0, 10)])],
        regions={'text': [containers.Region(id='r0', boundary=[(0, 0), (60, 0),
                                                               (60, 20), (0, 20)])]})
    data = json.loads(json.dumps(dataclasses.asdict(seg)))
    restored = containers.Segmentation(**data)
    assert isinstance(restored.lines[0], containers.BaselineLine)
    assert isinstance(restored.regions['text'][0], containers.Region)
    assert restored.lines[0].baseline == [[0, 5], [50, 5]]


def test_segmentation_type_casts():
    seg = containers.Segmentation(
        type='baselines', imagename='foo.png', text_direction='horizontal-lr',
        script_detection=False,
        lines=[containers.BaselineLine(id='l0', baseline=[(0, 5), (50, 5)],
                                       boundary=[(0, 0), (50, 0), (50, 10), (0, 10)])])
    bbox_seg = seg.to_bbox()
    assert bbox_seg.type == 'bbox'
    assert tuple(bbox_seg.lines[0].bbox) == (0, 0, 50, 10)
    back = bbox_seg.to_baselines()
    assert back.type == 'baselines'
    # original untouched
    assert seg.lines[0].baseline == [(0, 5), (50, 5)]
