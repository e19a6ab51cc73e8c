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


# ---- bbox <-> baseline cast matrix (reference tests/test_container.py) ----

from kraken_tpu.containers import BaselineLine, BBoxLine, Region, Segmentation

_SHARED = dict(id='line-1', text='hello', base_dir='L', imagename='page.png',
               tags={'type': [{'tag': 'default'}]}, split='train',
               regions=['r1'], language=['eng'])
_SHARED_FIELDS = ('id', 'text', 'base_dir', 'imagename', 'tags', 'split',
                  'regions', 'language')


def test_to_bbox_boundary_extents():
    bl = BaselineLine(baseline=[(20, 40), (90, 42)],
                      boundary=[(10, 30), (100, 30), (100, 55), (10, 55), (10, 30)],
                      **_SHARED)
    out = bl.to_bbox()
    assert isinstance(out, BBoxLine)
    assert tuple(out.bbox) == (10, 30, 100, 55)


def test_to_bbox_baseline_fallbacks():
    # None boundary falls back to the baseline polyline extents
    out = BaselineLine(baseline=[(5, 8), (60, 12), (90, 7)], boundary=None,
                       **_SHARED).to_bbox()
    assert tuple(out.bbox) == (5, 7, 90, 12)
    # empty boundary likewise
    out = BaselineLine(baseline=[(5, 8), (60, 12)], boundary=[], **_SHARED).to_bbox()
    assert tuple(out.bbox) == (5, 8, 60, 12)


def test_to_bbox_preserves_shared_fields_and_direction():
    bl = BaselineLine(baseline=[(0, 0), (1, 1)], **_SHARED)
    out = bl.to_bbox()
    for f in _SHARED_FIELDS:
        assert getattr(bl, f) == getattr(out, f)
    assert out.type == 'bbox'
    for td in ('horizontal-lr', 'horizontal-rl', 'vertical-lr', 'vertical-rl'):
        assert BaselineLine(baseline=[(0, 0), (10, 10)],
                            **_SHARED).to_bbox(text_direction=td).text_direction == td


def test_to_bbox_does_not_mutate_input():
    baseline = [(0, 0), (10, 10)]
    boundary = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    bl = BaselineLine(id='x', baseline=list(baseline), boundary=list(boundary))
    bl.to_bbox()
    assert bl.baseline == baseline and bl.boundary == boundary


_BBOX = (10, 20, 110, 70)
# (text_direction, topline) -> expected baseline endpoints; heights/widths
# quarter/half insets per the reference placement rules
_BASELINE_CASES = [
    ('horizontal-lr', False, [(10, 57), (110, 57)]),
    ('horizontal-lr', True, [(10, 32), (110, 32)]),
    ('horizontal-lr', None, [(10, 45), (110, 45)]),
    ('horizontal-rl', False, [(110, 57), (10, 57)]),
    ('horizontal-rl', True, [(110, 32), (10, 32)]),
    ('horizontal-rl', None, [(110, 45), (10, 45)]),
    ('vertical-lr', False, [(35, 20), (35, 70)]),
    ('vertical-lr', True, [(85, 20), (85, 70)]),
    ('vertical-lr', None, [(60, 20), (60, 70)]),
    ('vertical-rl', False, [(85, 20), (85, 70)]),
    ('vertical-rl', True, [(35, 20), (35, 70)]),
    ('vertical-rl', None, [(60, 20), (60, 70)]),
]


@pytest.mark.parametrize('td,topline,expected', _BASELINE_CASES)
def test_to_baseline_placement(td, topline, expected):
    out = BBoxLine(bbox=_BBOX, text_direction=td, **_SHARED).to_baseline(topline=topline)
    assert isinstance(out, BaselineLine)
    assert [tuple(p) for p in out.baseline] == expected
    assert [tuple(p) for p in out.boundary] == [(10, 20), (110, 20), (110, 70),
                                                (10, 70), (10, 20)]
    assert out.type == 'baselines'


def test_to_baseline_preserves_shared_fields():
    bx = BBoxLine(bbox=_BBOX, text_direction='horizontal-lr', **_SHARED)
    out = bx.to_baseline()
    for f in _SHARED_FIELDS:
        assert getattr(bx, f) == getattr(out, f)


def test_to_baseline_degenerate_bbox():
    out = BBoxLine(id='x', bbox=(5, 5, 5, 5), text_direction='horizontal-lr').to_baseline()
    assert [tuple(p) for p in out.baseline] == [(5, 5), (5, 5)]
    assert [tuple(p) for p in out.boundary] == [(5, 5)] * 5


def test_to_baseline_does_not_mutate_input():
    bx = BBoxLine(id='x', bbox=_BBOX, text_direction='horizontal-lr')
    bx.to_baseline()
    assert tuple(bx.bbox) == _BBOX and bx.text_direction == 'horizontal-lr'


def _baselines_seg():
    return Segmentation(
        type='baselines', imagename='page.png', text_direction='horizontal-lr',
        script_detection=True,
        lines=[BaselineLine(id='l1', baseline=[(10, 50), (100, 50)],
                            boundary=[(10, 30), (100, 30), (100, 70), (10, 70), (10, 30)],
                            text='foo'),
               BaselineLine(id='l2', baseline=[(10, 150), (100, 150)],
                            boundary=[(10, 130), (100, 130), (100, 170), (10, 170), (10, 130)],
                            text='bar')],
        regions={'text': [Region(id='r1', boundary=[(0, 0), (200, 0), (200, 200), (0, 200), (0, 0)])]},
        line_orders=[[0, 1]], language=['eng'])


def _bbox_seg():
    return Segmentation(
        type='bbox', imagename='page.png', text_direction='horizontal-rl',
        script_detection=False,
        lines=[BBoxLine(id='l1', bbox=(10, 30, 100, 70), text_direction='horizontal-rl', text='foo'),
               BBoxLine(id='l2', bbox=(10, 130, 100, 170), text_direction='horizontal-rl', text='bar')],
        regions={'text': [Region(id='r1', boundary=[(0, 0), (200, 0), (200, 200), (0, 200), (0, 0)])]},
        line_orders=[[0, 1]], language=['eng'])


def test_segmentation_to_bbox_roundtrip():
    seg = _baselines_seg()
    out = seg.to_bbox()
    assert out.type == 'bbox' and len(out.lines) == 2
    assert all(isinstance(ln, BBoxLine) and ln.text_direction == seg.text_direction
               for ln in out.lines)
    assert tuple(out.lines[0].bbox) == (10, 30, 100, 70)
    assert tuple(out.lines[1].bbox) == (10, 130, 100, 170)


def test_segmentation_to_baselines_roundtrip_and_topline():
    seg = _bbox_seg()
    out = seg.to_baselines()
    assert out.type == 'baselines' and len(out.lines) == 2
    assert all(isinstance(ln, BaselineLine) and tuple(ln.boundary[0]) == tuple(ln.boundary[-1])
               for ln in out.lines)
    # topline placement through the Segmentation-level cast (horizontal-rl)
    up = _bbox_seg().to_baselines(topline=True)
    assert [tuple(p) for p in up.lines[0].baseline] == [(100, 40), (10, 40)]
    center = _bbox_seg().to_baselines(topline=None)
    assert [tuple(p) for p in center.lines[0].baseline] == [(100, 50), (10, 50)]


def test_segmentation_cast_passthrough_fields():
    seg = _baselines_seg()
    out = seg.to_bbox()
    assert out.imagename == seg.imagename
    assert out.text_direction == seg.text_direction
    assert out.script_detection == seg.script_detection
    assert out.line_orders == seg.line_orders
    assert out.language == seg.language
    assert list(out.regions.keys()) == list(seg.regions.keys())
    assert out.regions['text'][0].id == 'r1'


def test_segmentation_identity_casts_deep_copy():
    seg = _baselines_seg()
    out = seg.to_baselines()
    assert out is not seg and out.lines is not seg.lines
    for orig, new in zip(seg.lines, out.lines):
        assert orig is not new
        assert orig.baseline == new.baseline and orig.boundary == new.boundary
    assert out.regions is not seg.regions
    assert out.regions['text'] is not seg.regions['text']
    assert out.regions['text'][0] is not seg.regions['text'][0]
    assert out.line_orders is not seg.line_orders
    assert out.line_orders == seg.line_orders

    seg2 = _bbox_seg()
    out2 = seg2.to_bbox()
    assert out2 is not seg2 and out2.lines is not seg2.lines
    for orig, new in zip(seg2.lines, out2.lines):
        assert orig is not new and tuple(orig.bbox) == tuple(new.bbox)


def test_segmentation_cross_cast_independent():
    seg = _baselines_seg()
    out = seg.to_bbox()
    assert out.lines is not seg.lines
    assert all(o is not n for o, n in zip(seg.lines, out.lines))
    assert out.regions is not seg.regions


def test_segmentation_empty_lines_cast():
    seg = Segmentation(type='baselines', imagename='page.png',
                       text_direction='horizontal-lr', script_detection=False,
                       lines=[])
    out = seg.to_bbox()
    assert out.type == 'bbox' and out.lines == []


def test_segmentation_vertical_rl_cast():
    seg = Segmentation(type='bbox', imagename='page.png',
                       text_direction='vertical-rl', script_detection=False,
                       lines=[BBoxLine(id='l1', bbox=(10, 20, 110, 70),
                                       text_direction='vertical-rl')])
    out = seg.to_baselines(topline=False)
    assert [tuple(p) for p in out.lines[0].baseline] == [(85, 20), (85, 70)]


# ---- exact-value record matrix (reference tests/test_rpred.py:35-265) ----

@pytest.fixture(scope='module')
def arabic_bbox_rec(arabic_bbox):
    return arabic_bbox[0]


@pytest.fixture(scope='module')
def arabic_bl_raw(resources):
    return load_ref_pickle(resources / 'arabic_bl_records.pkl')


@pytest.fixture(scope='module')
def latin_bl_rec(resources):
    return load_ref_pickle(resources / 'bl_rec.pkl').lines[5]


def test_arabic_bbox_cut_count(arabic_bbox_rec):
    assert len(arabic_bbox_rec.cuts) == 52


def test_arabic_bbox_display_conversion(arabic_bbox_rec):
    do = arabic_bbox_rec.display_order()
    assert do == do.display_order()
    assert do.prediction == 'مذا ذا درع نلاهو زکذل انبا ملةدیس هىک ماف نابصل ممهع'
    assert do[:][2] == pytest.approx(0.7227956, abs=1e-4)


def test_arabic_bbox_logical_preserves(arabic_bbox_rec):
    assert arabic_bbox_rec == arabic_bbox_rec.logical_order()
    lo = arabic_bbox_rec.logical_order()
    assert lo.prediction == 'عهمم لصبان فام کىه سیدةلم ابنا لذکز وهالن عرد اذ اذم'


def test_arabic_bbox_slicing_exact(arabic_bbox_rec):
    pred, cut, conf = arabic_bbox_rec[1:8]
    assert pred == 'همم لصب'
    assert tuple(tuple(p) for p in cut) == ((861, 245), (980, 245), (980, 325), (861, 325))
    assert conf == pytest.approx(0.7444813, abs=1e-4)


def test_arabic_bbox_step_slicing_exact(arabic_bbox_rec):
    pred, cut, conf = arabic_bbox_rec[1:5:2]
    assert pred == 'هم'
    assert tuple(tuple(p) for p in cut) == ((936, 245), (980, 245), (980, 325), (936, 325))
    assert conf == pytest.approx(0.8795802, abs=1e-4)


_ARABIC_LOGICAL = ('عند عدم الع'
                   'صبات اذا لم '
                   'يكن للصغير'
                   'ة أم أيضا'
                   'ً لماذ كر. . و'
                   'لنا أن نقو'
                   'ل ان الآم')


def test_arabic_bl_display_to_logical_exact(arabic_bl_raw):
    record = containers.BaselineOCRRecord(**arabic_bl_raw[0], display_order=True)
    assert record == record.display_order()
    lo = record.logical_order()
    assert lo.prediction == _ARABIC_LOGICAL
    assert lo[:][2] == pytest.approx(0.9746356, abs=1e-4)


def test_arabic_bl_logical_to_display_exact(arabic_bl_raw):
    record = containers.BaselineOCRRecord(**arabic_bl_raw[0], display_order=False)
    assert record == record.logical_order()
    do = record.display_order()
    # the bidi toggle is symmetric, both directions produce the same text
    assert do.prediction == _ARABIC_LOGICAL
    assert do[:][2] == pytest.approx(0.9746356, abs=1e-4)


def test_arabic_bl_roundtrip(arabic_bl_raw):
    record = containers.BaselineOCRRecord(**arabic_bl_raw[0], display_order=True)
    assert record.logical_order().display_order().prediction == record.prediction


def test_arabic_bl_short_record_logical(arabic_bl_raw):
    record = containers.BaselineOCRRecord(**arabic_bl_raw[6], display_order=True)
    assert record.logical_order().prediction == 'يتناولها .'


def test_arabic_bl_slicing_exact(arabic_bl_raw):
    record = containers.BaselineOCRRecord(**arabic_bl_raw[0], display_order=True)
    pred, cut, conf = record[2:8]
    assert pred == 'الا نا'
    assert conf == pytest.approx(0.9937494, abs=1e-4)
    record6 = containers.BaselineOCRRecord(**arabic_bl_raw[6], display_order=True)
    pred, cut, conf = record6[1:5:2]
    assert pred == ' ه'
    assert conf == pytest.approx(0.9366213, abs=1e-4)


def test_arabic_bl_logical_order_slicing(arabic_bl_raw):
    record = containers.BaselineOCRRecord(**arabic_bl_raw[0], display_order=True)
    pred, cut, conf = record.logical_order()[2:8]
    assert pred == 'د عدم '
    assert conf == pytest.approx(0.9969620, abs=1e-4)


def test_latin_bl_identities_and_slicing(latin_bl_rec):
    rec = latin_bl_rec
    assert rec == rec.display_order()
    assert rec == rec.logical_order()
    pred, cut, conf = rec[1:8]
    assert pred == 'i quelq'
    assert [list(p) for p in cut] == [[320, 373], [320, 419], [424, 420], [424, 368]]
    assert conf == pytest.approx(0.9996614, abs=1e-4)
    pred, cut, conf = rec[1:5:2]
    assert pred == 'iq'
    assert [list(p) for p in cut] == [[320, 373], [320, 419], [346, 423], [346, 375]]
    assert conf == pytest.approx(0.9998304, abs=1e-4)


def test_line_asdict_matches_dataclasses_asdict():
    """_line_asdict (the record-construction fast path) must be
    observationally identical to dataclasses.asdict, including independent
    copies of nested geometry/tags."""
    from dataclasses import asdict
    from kraken_tpu.containers import BBoxLine, BaselineLine, _line_asdict
    bl = BaselineLine(id='l1', text='foo', base_dir='L',
                      imagename='x.png',
                      tags={'type': [{'type': 'default'}],
                            'style': [{'type': 'bold'}, {'type': 'serif'}]},
                      split='train', regions=['r1', 'r2'],
                      language=['deu', 'lat'],
                      baseline=[[0, 10], [100, 12]],
                      boundary=[(0, 0), (100, 0), (100, 20), (0, 20)])
    got, want = _line_asdict(bl), asdict(bl)
    assert got == want
    # independence: mutating the copy must not touch the source
    got['baseline'][0][0] = 999
    got['tags']['type'][0]['type'] = 'mutated'
    got['regions'].append('r3')
    assert bl.baseline[0][0] == 0
    assert bl.tags['type'][0]['type'] == 'default'
    assert bl.regions == ['r1', 'r2']

    bb = BBoxLine(id='l2', bbox=(1, 2, 3, 4), text_direction='horizontal-rl',
                  tags=None, regions=None)
    assert _line_asdict(bb) == asdict(bb)
