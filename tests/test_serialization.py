"""
Serialization tests: ALTO/PageXML output validates against the official XSD
schemas, IDs are unique, and baselines round-trip through the XML parser —
the same validation strategy as the reference test suite, driven by the
reference's golden record pickles.
"""
import copy
import io
import pickle
import tempfile
from collections import Counter

import pytest
from lxml import etree

from kraken_tpu import serialization, xml
from kraken_tpu import containers


class _RefUnpickler(pickle.Unpickler):
    """Maps reference kraken container classes onto kraken_tpu containers."""

    def find_class(self, module, name):
        if module == 'kraken.containers':
            return getattr(containers, name)
        if module.startswith('kraken.'):
            raise pickle.UnpicklingError(f'Unexpected reference class {module}.{name}')
        return super().find_class(module, name)


def load_ref_pickle(path):
    with open(path, 'rb') as fp:
        return _RefUnpickler(fp).load()


@pytest.fixture(scope='module')
def box_seg(resources):
    return load_ref_pickle(resources / 'box_rec.pkl')


@pytest.fixture(scope='module')
def bl_seg(resources):
    return load_ref_pickle(resources / 'bl_rec.pkl')


def _validate_alto(text, resources):
    doc = etree.fromstring(text.encode('utf-8'))
    ids = [x.get('ID') for x in doc.findall('.//*[@ID]')]
    assert not ids or Counter(ids).most_common(1)[0][1] == 1, 'Duplicate IDs in ALTO output'
    with open(resources / 'alto-4-3.xsd') as fp:
        schema = etree.XMLSchema(etree.parse(fp))
    schema.assertValid(doc)


def _validate_page(text, resources):
    doc = etree.fromstring(text.encode('utf-8'))
    ids = [x.get('id') for x in doc.findall('.//*[@id]')]
    assert not ids or Counter(ids).most_common(1)[0][1] == 1, 'Duplicate IDs in PageXML output'
    with open(resources / 'pagecontent.xsd') as fp:
        schema = etree.XMLSchema(etree.parse(fp))
    schema.assertValid(doc)


def _segmentation(seg, with_regions=True):
    lines = seg.lines if with_regions else copy.deepcopy(seg.lines)
    if not with_regions:
        for line in lines:
            line.regions = []
    return containers.Segmentation(type=seg.type,
                                   imagename='foo.png',
                                   text_direction='horizontal-lr',
                                   lines=lines,
                                   script_detection=True,
                                   regions=seg.regions if with_regions else {})


def test_box_alto(box_seg, resources):
    out = serialization.serialize(_segmentation(box_seg), image_size=(2544, 156),
                                  template='alto')
    _validate_alto(out, resources)


def test_box_page(box_seg, resources):
    out = serialization.serialize(_segmentation(box_seg), image_size=(2544, 156),
                                  template='page')
    _validate_page(out, resources)


def test_box_hocr(box_seg):
    out = serialization.serialize(_segmentation(box_seg), image_size=(2544, 156),
                                  template='hocr')
    doc = etree.fromstring(out.encode('utf-8'))
    ids = [x.get('id') for x in doc.findall('.//*[@id]')]
    assert Counter(ids).most_common(1)[0][1] == 1


def test_box_abbyy(box_seg):
    out = serialization.serialize(_segmentation(box_seg), image_size=(2544, 156),
                                  template='abbyyxml')
    etree.fromstring(out.encode('utf-8'))


def test_bl_alto_with_regions(bl_seg, resources):
    out = serialization.serialize(_segmentation(bl_seg), image_size=(2544, 156),
                                  template='alto')
    _validate_alto(out, resources)


def test_bl_page_with_regions(bl_seg, resources):
    out = serialization.serialize(_segmentation(bl_seg), image_size=(2544, 156),
                                  template='page')
    _validate_page(out, resources)


def test_bl_region_only_serialization(bl_seg, resources):
    seg = containers.Segmentation(type='baselines', imagename='foo.png',
                                  text_direction='horizontal-lr',
                                  script_detection=False, lines=[],
                                  regions=bl_seg.regions)
    out = serialization.serialize(seg, image_size=(2544, 156), template='alto')
    _validate_alto(out, resources)
    out = serialization.serialize(seg, image_size=(2544, 156), template='page')
    _validate_page(out, resources)


def test_bl_roundtrip_baselines(bl_seg):
    """Baselines survive serialization and re-parsing in order."""
    seg = _segmentation(bl_seg, with_regions=False)
    out = serialization.serialize(seg, image_size=(2544, 156), template='alto')
    with tempfile.NamedTemporaryFile(suffix='.xml') as fp:
        fp.write(out.encode('utf-8'))
        fp.flush()
        parsed = xml.XMLPage(fp.name).to_container().lines
    for orig, new in zip(seg.lines, parsed):
        assert [list(p) for p in orig.baseline] == [list(p) for p in new.baseline]


def test_bl_roundtrip_page(bl_seg):
    seg = _segmentation(bl_seg, with_regions=False)
    out = serialization.serialize(seg, image_size=(2544, 156), template='page')
    with tempfile.NamedTemporaryFile(suffix='.xml') as fp:
        fp.write(out.encode('utf-8'))
        fp.flush()
        parsed = xml.XMLPage(fp.name).to_container().lines
    for orig, new in zip(seg.lines, parsed):
        assert [list(p) for p in orig.baseline] == [list(p) for p in new.baseline]


def test_no_subline_segmentation(bl_seg, resources):
    out = serialization.serialize(_segmentation(bl_seg), image_size=(2544, 156),
                                  template='alto', sub_line_segmentation=False)
    _validate_alto(out, resources)
    doc = etree.fromstring(out.encode('utf-8'))
    assert not doc.findall('.//{*}Glyph')


def test_processing_steps(bl_seg, resources):
    steps = [containers.ProcessingStep(id='0', category='processing',
                                       description='text recognition',
                                       settings={'model': 'foo.safetensors', 'pad': 16})]
    out = serialization.serialize(_segmentation(bl_seg), image_size=(2544, 156),
                                  template='alto', processing_steps=steps)
    _validate_alto(out, resources)
    assert 'text recognition' in out


def test_render_report():
    report = serialization.render_report(
        'model.safetensors', 1000, 50, 0.95, 0.96, 0.9,
        Counter({('a', 'b'): 10}), Counter({'Latin': 1000}),
        5, Counter({'Latin': 10}), Counter({'Latin': 35}))
    assert '95.00%' in report
    assert 'Latin' in report
    assert 'model.safetensors' in report


def test_serialization_deterministic(bl_seg):
    """Serializing the same Segmentation twice yields identical output
    (stable IDs and ordering — required for reproducible pipelines).
    PageXML legitimately embeds Created/LastChange wall-clock timestamps,
    which are excluded from the comparison."""
    def strip_ts(doc):
        return '\n'.join(line for line in doc.splitlines()
                         if '<Created>' not in line and '<LastChange>' not in line)
    for tpl in ('alto', 'pagexml', 'hocr', 'abbyyxml'):
        a = serialization.serialize(bl_seg, image_size=(1000, 800), template=tpl)
        b = serialization.serialize(bl_seg, image_size=(1000, 800), template=tpl)
        assert strip_ts(a) == strip_ts(b), f'{tpl} serialization is not deterministic'


# ---- no-boundary / vertical / abbyy-XSD matrix (reference
# tests/test_serialization.py:121-368) ----

def _validate_abbyy(text, resources):
    doc = etree.fromstring(text.encode('utf-8'))
    with open(resources / 'FineReader10-schema-v1.xml') as fp:
        schema = etree.XMLSchema(etree.parse(fp))
    schema.assertValid(doc)


@pytest.fixture(scope='module')
def no_boundary_seg():
    return containers.Segmentation(
        type='baselines', imagename='foo.png', text_direction='horizontal-lr',
        script_detection=False, regions={},
        lines=[containers.BaselineLine(id='line_no_boundary',
                                       baseline=[(10, 50), (200, 50)],
                                       boundary=None, text='test text'),
               containers.BaselineLine(id='line_normal',
                                       baseline=[(10, 100), (200, 100)],
                                       boundary=[(10, 80), (200, 80), (200, 120), (10, 120)],
                                       text='normal text')])


def test_box_vertical_hocr(box_seg):
    out = serialization.serialize(_segmentation(box_seg), image_size=(2000, 2000),
                                  writing_mode='vertical-lr', template='hocr')
    doc = etree.fromstring(out.encode('utf-8'))
    assert 'writing-mode: vertical-lr' in out
    ids = [x.get('id') for x in doc.findall('.//*[@id]')]
    assert Counter(ids).most_common(1)[0][1] == 1


def test_box_abbyy_schema_validation(box_seg, resources):
    out = serialization.serialize(_segmentation(box_seg), image_size=(2544, 156),
                                  template='abbyyxml')
    _validate_abbyy(out, resources)


def test_bl_abbyy_schema_validation(bl_seg, resources):
    out = serialization.serialize(_segmentation(bl_seg), image_size=(2000, 2000),
                                  template='abbyyxml')
    _validate_abbyy(out, resources)


def test_bl_region_abbyy_schema_validation(bl_seg, resources):
    out = serialization.serialize(_segmentation(bl_seg, with_regions=True),
                                  image_size=(2000, 2000), template='abbyyxml')
    _validate_abbyy(out, resources)


def test_no_boundary_alto(no_boundary_seg, resources):
    out = serialization.serialize(no_boundary_seg, image_size=(2000, 2000),
                                  template='alto')
    _validate_alto(out, resources)
    # bare BaselineLines have no `prediction`, so CONTENT stays empty —
    # reference-faithful (kraken/serialization.py:235 getattr default)
    assert 'line_no_boundary' in out and 'line_normal' in out


def test_no_boundary_pagexml(no_boundary_seg, resources):
    out = serialization.serialize(no_boundary_seg, image_size=(2000, 2000),
                                  template='pagexml')
    _validate_page(out, resources)


def test_no_boundary_abbyy(no_boundary_seg, resources):
    out = serialization.serialize(no_boundary_seg, image_size=(2000, 2000),
                                  template='abbyyxml')
    _validate_abbyy(out, resources)


def test_no_boundary_hocr(no_boundary_seg):
    out = serialization.serialize(no_boundary_seg, image_size=(2000, 2000),
                                  template='hocr')
    doc = etree.fromstring(out.encode('utf-8'))
    ids = [x.get('id') for x in doc.findall('.//*[@id]')]
    assert not ids or Counter(ids).most_common(1)[0][1] == 1


def test_region_only_all_formats(bl_seg, resources):
    """Segmentations with regions but no lines serialize in all formats."""
    seg = containers.Segmentation(type='baselines', imagename='foo.png',
                                  text_direction='horizontal-lr',
                                  script_detection=False, lines=[],
                                  regions=_segmentation(bl_seg, with_regions=True).regions)
    _validate_alto(serialization.serialize(seg, image_size=(2000, 2000),
                                           template='alto'), resources)
    _validate_page(serialization.serialize(seg, image_size=(2000, 2000),
                                           template='pagexml'), resources)
    _validate_abbyy(serialization.serialize(seg, image_size=(2000, 2000),
                                            template='abbyyxml'), resources)


def test_layout_html(bl_seg):
    """The 'layout' proofing view renders parseable HTML with one overlay
    box and one editable transcription entry per line."""
    seg = _segmentation(bl_seg)
    out = serialization.serialize(seg, image_size=(2000, 2000), template='layout')
    doc = etree.fromstring(out.encode('utf-8'), etree.HTMLParser())
    boxes = doc.findall('.//a[@class="line-box"]')
    entries = doc.findall('.//li')
    assert len(boxes) == len(seg.lines)
    assert len(entries) == len(seg.lines)
    for li, line in zip(entries, seg.lines):
        assert li.get('contenteditable') == 'true'
        assert li.get('data-line') == line.id
    # predictions appear in the transcription column
    text = ' '.join((li.text or '') for li in entries)
    for line in seg.lines:
        assert line.prediction.split()[0] in text


def test_layout_html_rtl():
    seg = containers.Segmentation(type='bbox', imagename='x.png',
                                  text_direction='horizontal-rl',
                                  script_detection=False, lines=[], regions={})
    out = serialization.serialize(seg, image_size=(100, 100), template='layout',
                                  writing_mode='vertical-rl')
    assert 'dir="rtl"' in out
