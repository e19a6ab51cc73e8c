"""
ALTO/PageXML parsing tests against the reference corpus and the reference
test suite's expectations (/root/reference/tests/test_xml.py).
"""
import pytest

from kraken_tpu import xml
from kraken_tpu.containers import BaselineLine, BBoxLine


@pytest.fixture
def alto_doc(resources):
    return resources / 'alto' / 'bsb00084914_00007.xml'


@pytest.fixture
def page_doc(resources):
    return resources / 'page' / 'cPAS-2000.xml'


def test_page_parsing(page_doc):
    doc = xml.XMLPage(page_doc, filetype='page')
    assert len(doc.get_sorted_lines()) == 97
    assert len([item for x in doc.regions.values() for item in x]) == 4


def test_alto_parsing(alto_doc):
    doc = xml.XMLPage(alto_doc, filetype='alto')
    assert len(doc.get_sorted_lines()) == 30
    assert len([item for x in doc.regions.values() for item in x]) == 5


def test_auto_parsing(page_doc, alto_doc):
    assert xml.XMLPage(page_doc, filetype='xml').filetype == 'page'
    assert xml.XMLPage(alto_doc, filetype='xml').filetype == 'alto'


def test_failure_cross_format(page_doc, alto_doc):
    with pytest.raises(ValueError):
        xml.XMLPage(alto_doc, filetype='page')
    with pytest.raises(ValueError):
        xml.XMLPage(page_doc, filetype='alto')


def test_failure_alto_invalid(resources):
    invalid = resources / 'alto' / 'invalid'
    for name in ['image.xml', 'mu.xml', 'dims.xml', 'zero_dims_missing_image.xml']:
        with pytest.raises(ValueError):
            xml.XMLPage(invalid / name)


def test_alto_zero_dims_fallback(resources):
    doc = xml.XMLPage(resources / 'alto' / 'zero_dims.xml')
    assert doc.image_size[0] > 0 and doc.image_size[1] > 0


def test_alto_basedirection(alto_doc):
    seg = xml.XMLPage(alto_doc).to_container()
    base_dirs = [x.base_dir for x in seg.lines]
    assert base_dirs == (['L', 'L'] + ['R'] * 23 + [None] * 4 + ['R'])


def test_alto_language_parsing(alto_doc):
    seg = xml.XMLPage(alto_doc).to_container()
    languages = [x.language for x in seg.lines]
    assert languages[0] == ['iai']
    assert languages[1] == ['deu', 'heb']
    assert languages[23] == ['eng']
    assert languages[25] == ['hbo']
    assert languages[28] == ['deu', 'eng']
    assert [x.language for x in seg.regions['Paratext']] == [['hbo'], ['hbo'], ['hbo']]


def test_alto_fallback_region_boundaries(resources):
    doc = xml.XMLPage(resources / 'alto' / 'reg_test.xml')
    assert set(doc.regions.keys()) == {'text'}
    expected = [[(812, 606), (2755, 648), (2723, 3192), (808, 3240)],
                [(596, 2850), (596, 3008), (729, 3008), (729, 2850)]]
    boundaries = [reg.boundary for reg in doc.regions['text']]
    assert boundaries[:2] == expected


def test_alto_tag_parsing(alto_doc):
    seg = xml.XMLPage(alto_doc).to_container()
    line_tags = [line.tags for line in seg.lines]
    assert line_tags[2] == {'type': [{'type': 'heading'}]}
    assert line_tags[11] == {'label_0': [{'type': 'foo'}], 'label_1': [{'type': 'bar'}]}
    assert line_tags[12] == {'label_1': [{'type': 'bar'}, {'type': 'baz'}]}
    assert line_tags[23] == {'language': [{'type': 'eng'}]}
    assert line_tags[28] == {'language': [{'type': 'deu'}, {'type': 'eng'}]}


def test_alto_linetypes(alto_doc):
    seg = xml.XMLPage(alto_doc, linetype='baselines').to_container()
    assert len(seg.lines) == 30
    assert all(isinstance(line, BaselineLine) for line in seg.lines)
    seg = xml.XMLPage(alto_doc, linetype='bbox').to_container()
    assert len(seg.lines) == 31
    assert all(isinstance(line, BBoxLine) for line in seg.lines)


def test_page_language_parsing(page_doc):
    seg = xml.XMLPage(page_doc).to_container()
    languages = [x.language for x in seg.lines]
    assert languages[0] == ['hbo']
    assert languages[1] == ['heb', 'deu', 'eng']
    assert languages[3] == ['deu']
    assert languages[-1] == ['pol', 'deu']
    reg_langs = [x.language for x in seg.regions['Machine\\u0020Printed\\u0020text']]
    assert reg_langs == [['hbo'], ['heb', 'deu', 'eng'], ['pol', 'deu']]


def test_page_explicit_ro(resources):
    doc = xml.XMLPage(resources / 'page' / 'explicit_ro.xml')
    ro_keys = [k for k, v in doc.reading_orders.items()
               if v['level'] == 'line' and k not in ('line_implicit', 'line_transkribus')]
    assert ro_keys
    for k in ro_keys:
        order = doc.reading_orders[k]['order']
        assert all(lid in doc.lines for lid in order)


def test_page_unordered_group(resources):
    doc = xml.XMLPage(resources / 'page' / 'explicit_ro_unordered.xml')
    partial = [v for v in doc.reading_orders.values() if v['is_total'] is False]
    assert partial


def test_to_container_orders(alto_doc):
    seg = xml.XMLPage(alto_doc).to_container()
    assert seg.type == 'baselines'
    assert seg.line_orders
    for order in seg.line_orders:
        assert all(0 <= idx < len(seg.lines) for idx in order)


def test_missing_region_coords(resources):
    doc = xml.XMLPage(resources / 'alto' / 'missing_coords_ro.xml')
    # lines of the coordinate-less region are still parsed
    assert len(doc.lines) > 0
    region_ids = {reg.id for regs in doc.regions.values() for reg in regs}
    for ro in doc.reading_orders.values():
        if ro['level'] == 'region':
            assert all(rid in region_ids for rid in ro['order'])


def test_get_sorted_regions(page_doc):
    doc = xml.XMLPage(page_doc)
    regions = doc.get_sorted_regions()
    assert len(regions) == 4


def test_get_lines_by_region(page_doc):
    doc = xml.XMLPage(page_doc)
    regions = doc.get_sorted_regions()
    lines = doc.get_sorted_lines_by_region(regions[1].id)
    assert all(ln.regions[0] == regions[1].id for ln in lines)
