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


# ---- full reference matrices (reference tests/test_xml.py:55-604) ----

@pytest.fixture
def explicit_ro_doc(resources):
    return resources / 'page' / 'explicit_ro.xml'


def test_failure_page_invalid_variants(resources):
    invalid = resources / 'page' / 'invalid'
    for name in ['image.xml', 'dims.xml', 'zero_dims_missing_image.xml']:
        with pytest.raises(ValueError):
            xml.XMLPage(invalid / name)


def test_alto_zero_dims_exact_fallback(resources):
    doc = xml.XMLPage(resources / 'alto' / 'zero_dims.xml', filetype='alto')
    assert doc.image_size == (123, 45)


def test_page_zero_dims_exact_fallback(resources):
    doc = xml.XMLPage(resources / 'page' / 'zero_dims.xml', filetype='page')
    assert doc.image_size == (123, 45)


def test_alto_language_full_matrix(alto_doc):
    seg = xml.XMLPage(alto_doc).to_container()
    languages = [x.language for x in seg.lines]
    expected = ([['iai']] + [['deu', 'heb']] * 22 + [['eng'], ['deu', 'heb']]
                + [['hbo']] * 3 + [['deu', 'eng'], ['hbo']])
    assert languages == expected
    for region_type, region_langs in [('Main', [['deu', 'heb']]),
                                      ('Paratext', [['hbo'], ['hbo'], ['hbo']]),
                                      ('Margin', [['hbo']])]:
        assert [x.language for x in seg.regions[region_type]] == region_langs


def test_alto_region_boundary_none_excluded(resources):
    """
    Region boundary hierarchy shape -> rect -> excluded: a region with
    neither a Shape polygon nor HPOS/VPOS rect attributes is dropped from
    the regions dict (the reference's zip-truncated
    test_alto_fallback_region_boundaries masks this, but its parser does the
    same — kraken/lib/xml/alto.py:170,195 region_has_coords gate).
    """
    doc = xml.XMLPage(resources / 'alto' / 'reg_test.xml')
    boundaries = [reg.boundary for reg in doc.regions['text']]
    assert len(boundaries) == 2
    assert all(b is not None for b in boundaries)


def test_alto_tag_full_matrix(alto_doc):
    seg = xml.XMLPage(alto_doc).to_container()
    tags = [line.tags for line in seg.lines]
    expected = [None] * 30
    expected[2] = {'type': [{'type': 'heading'}]}
    expected[11] = {'label_0': [{'type': 'foo'}], 'label_1': [{'type': 'bar'}]}
    expected[12] = {'label_1': [{'type': 'bar'}, {'type': 'baz'}]}
    expected[23] = {'language': [{'type': 'eng'}]}
    expected[28] = {'language': [{'type': 'deu'}, {'type': 'eng'}]}
    assert tags == expected


def test_page_basedirection_full_matrix(page_doc):
    seg = xml.XMLPage(page_doc).to_container()
    base_dirs = [x.base_dir for x in seg.lines]
    assert base_dirs == ['R', 'L', 'L'] + ['R'] * 46 + ['L'] * 48


def test_page_split_full_matrix(page_doc):
    seg = xml.XMLPage(page_doc).to_container()
    splits = [x.split for x in seg.lines]
    expected = [None] * 97
    expected[0] = 'train'
    expected[4] = 'validation'
    expected[24] = 'train'
    expected[25] = 'invalid'
    assert splits == expected


def test_page_language_full_matrix(page_doc):
    seg = xml.XMLPage(page_doc).to_container()
    languages = [x.language for x in seg.lines]
    expected = ([['hbo']] + [['heb', 'deu', 'eng']] * 2 + [['deu']]
                + [['heb', 'deu', 'eng']] * 45 + [['pol', 'deu']] * 48)
    assert languages == expected


def test_alto_ro_string_refs_flattened(alto_doc):
    """String-level RO refs are flattened to line IDs, not discarded."""
    doc = xml.XMLPage(alto_doc, filetype='alto')
    assert 'og_0' in doc.reading_orders
    ro = doc.reading_orders['og_0']
    assert ro['level'] == 'line'
    assert len(ro['order']) == 30
    assert all(lid in doc.lines for lid in ro['order'])


def test_alto_ro_region_level_flattened(alto_doc):
    doc = xml.XMLPage(alto_doc, filetype='alto')
    assert 'og_0:regions' in doc.reading_orders
    ro = doc.reading_orders['og_0:regions']
    assert ro['level'] == 'region'
    region_ids = {reg.id for regs in doc.regions.values() for reg in regs}
    assert all(rid in region_ids for rid in ro['order'])


def test_alto_implicit_order_levels(alto_doc):
    doc = xml.XMLPage(alto_doc, filetype='alto')
    assert doc.reading_orders['line_implicit']['level'] == 'line'
    assert doc.reading_orders['region_implicit']['level'] == 'region'


def test_page_order_levels_incl_transkribus(page_doc):
    doc = xml.XMLPage(page_doc, filetype='page')
    assert doc.reading_orders['line_implicit']['level'] == 'line'
    assert doc.reading_orders['region_implicit']['level'] == 'region'
    assert doc.reading_orders['region_transkribus']['level'] == 'region'


def test_page_explicit_ro_exact_expansion(explicit_ro_doc):
    """Explicit region RO r2,r1,r3 expands to lines l3,l4,l1,l2,l5."""
    doc = xml.XMLPage(explicit_ro_doc, filetype='page')
    assert len(doc.lines) == 5
    assert len([item for x in doc.regions.values() for item in x]) == 3
    assert doc.reading_orders['ro_1']['level'] == 'line'
    assert doc.reading_orders['ro_1']['order'] == ['l3', 'l4', 'l1', 'l2', 'l5']


def test_page_explicit_ro_region_level(explicit_ro_doc):
    doc = xml.XMLPage(explicit_ro_doc, filetype='page')
    ro = doc.reading_orders['ro_1:regions']
    assert ro['level'] == 'region'
    assert ro['order'] == ['r2', 'r1', 'r3']


def test_page_unordered_group_partial_orders(resources):
    doc = xml.XMLPage(resources / 'page' / 'explicit_ro_unordered.xml',
                      filetype='page')
    assert doc.reading_orders['ro_main']['is_total'] is False
    assert doc.reading_orders['ro_margin']['is_total'] is False
    assert doc.reading_orders['ro_main']['order'] == ['l1', 'l2']
    assert doc.reading_orders['ro_margin']['order'] == ['l3']


def test_to_container_explicit_ro_indices(explicit_ro_doc):
    seg = xml.XMLPage(explicit_ro_doc, filetype='page').to_container()
    idx = {line.id: i for i, line in enumerate(seg.lines)}
    expected = [idx['l3'], idx['l4'], idx['l1'], idx['l2'], idx['l5']]
    assert expected in seg.line_orders
    for order in seg.line_orders:
        assert all(isinstance(i, int) and 0 <= i < len(seg.lines) for i in order)


def test_get_sorted_lines_by_region_returns_lines(explicit_ro_doc):
    doc = xml.XMLPage(explicit_ro_doc, filetype='page')
    lines = doc.get_sorted_lines_by_region('r1')
    assert [ln.id for ln in lines] == ['l1', 'l2']
    assert all(isinstance(ln, BaselineLine) for ln in lines)


def test_get_sorted_regions_explicit_order(explicit_ro_doc):
    from kraken_tpu.containers import Region
    doc = xml.XMLPage(explicit_ro_doc, filetype='page')
    regions = doc.get_sorted_regions('ro_1:regions')
    assert [r.id for r in regions] == ['r2', 'r1', 'r3']
    assert all(isinstance(r, Region) for r in regions)


# ---- graceful degradation with missing region coordinates ----

@pytest.fixture
def alto_nocoords(resources):
    return xml.XMLPage(resources / 'alto' / 'missing_coords_ro.xml', filetype='alto')


@pytest.fixture
def page_nocoords(resources):
    return xml.XMLPage(resources / 'page' / 'missing_coords_ro.xml', filetype='page')


def test_alto_missing_coords_lines_parsed(alto_nocoords):
    assert 'tl_3' in alto_nocoords.lines
    assert alto_nocoords.lines['tl_3'].regions == []


def test_alto_missing_coords_region_excluded(alto_nocoords):
    region_ids = {r.id for regs in alto_nocoords.regions.values() for r in regs}
    assert 'tb_nocoords' not in region_ids
    assert {'tb_1', 'tb_2'} <= region_ids


def test_alto_missing_coords_implicit_orders(alto_nocoords):
    region_order = alto_nocoords.reading_orders['region_implicit']['order']
    assert 'tb_nocoords' not in region_order
    assert 'tb_1' in region_order and 'tb_2' in region_order
    assert 'tl_3' in alto_nocoords.reading_orders['line_implicit']['order']


def test_alto_missing_coords_explicit_ro_skips(alto_nocoords):
    ro_line = alto_nocoords.reading_orders['og_test']
    assert ro_line['level'] == 'line'
    assert {'tl_1', 'tl_2', 'tl_4'} <= set(ro_line['order'])
    assert 'tl_3' not in ro_line['order']
    ro_region = alto_nocoords.reading_orders['og_test:regions']
    assert ro_region['level'] == 'region'
    assert ro_region['order'] == ['tb_1', 'tb_2']


def test_alto_missing_coords_to_container(alto_nocoords):
    seg = alto_nocoords.to_container()
    assert len(seg.lines) == 4
    assert 'tl_3' in [line.id for line in seg.lines]
    for order in seg.line_orders:
        assert all(isinstance(i, int) and 0 <= i < len(seg.lines) for i in order)


def test_page_missing_coords_lines_parsed(page_nocoords):
    assert 'l3' in page_nocoords.lines
    assert page_nocoords.lines['l3'].regions == []


def test_page_missing_coords_region_excluded(page_nocoords):
    region_ids = {r.id for regs in page_nocoords.regions.values() for r in regs}
    assert 'r_nocoords' not in region_ids
    assert {'r1', 'r2'} <= region_ids


def test_page_missing_coords_implicit_orders(page_nocoords):
    region_order = page_nocoords.reading_orders['region_implicit']['order']
    assert 'r_nocoords' not in region_order
    assert 'r1' in region_order and 'r2' in region_order
    assert 'l3' in page_nocoords.reading_orders['line_implicit']['order']


def test_page_missing_coords_explicit_ro_skips(page_nocoords):
    ro_line = page_nocoords.reading_orders['ro_test']
    assert ro_line['level'] == 'line'
    assert {'l1', 'l2', 'l4'} <= set(ro_line['order'])
    assert 'l3' not in ro_line['order']
    ro_region = page_nocoords.reading_orders['ro_test:regions']
    assert ro_region['order'] == ['r1', 'r2']


def test_page_missing_coords_to_container(page_nocoords):
    seg = page_nocoords.to_container()
    assert len(seg.lines) == 4
    assert 'l3' in [line.id for line in seg.lines]
    for order in seg.line_orders:
        assert all(isinstance(i, int) and 0 <= i < len(seg.lines) for i in order)


def test_page_missing_coords_transkribus_ro(resources):
    doc = xml.XMLPage(resources / 'page' / 'missing_coords_transkribus.xml',
                      filetype='page')
    tr = doc.reading_orders['region_transkribus']
    assert 'r_nocoords' not in tr['order']
    assert tr['order'] == ['r1', 'r2']
