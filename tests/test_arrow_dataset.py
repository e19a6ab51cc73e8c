"""
Arrow binary-dataset compilation tests (reference:
tests/test_arrow_dataset.py): schema metadata validation (dataset type,
line counts, empty-line retention), every input format (path pairs, XML
baselines, XML bbox crops, pre-parsed Segmentation), force_type overrides
with mismatch warnings, and image-load failure handling.
"""
import json
import logging

import pyarrow as pa
import pytest

from kraken_tpu.dataset.arrow import build_binary_dataset
from kraken_tpu.xml import XMLPage

XML = '170025120000003,0074-lite.xml'


def _validate_ds(path, num_lines, num_empty_lines, ds_type):
    with pa.memory_map(str(path), 'rb') as source:
        table = pa.ipc.open_file(source).read_all()
        raw_metadata = table.schema.metadata
        assert raw_metadata and b'lines' in raw_metadata, \
            f'{path} lacks a readable arrow metadata record'
        metadata = json.loads(raw_metadata[b'lines'])
    assert metadata['type'] == ds_type
    assert metadata['counts']['all'] == num_lines
    assert len(table) == num_lines
    real_empty = len([line for line in table.column('lines')
                      if not str(line[0])])
    assert real_empty == num_empty_lines
    return metadata


def test_build_path_dataset(resources, tmp_path):
    out = tmp_path / 'ds.arrow'
    build_binary_dataset(files=4 * [str(resources / '000236.png')],
                         output_file=str(out), format_type='path')
    _validate_ds(out, 4, 0, 'kraken_recognition_bbox')


def test_build_xml_dataset(resources, tmp_path):
    out = tmp_path / 'ds.arrow'
    build_binary_dataset(files=[str(resources / XML)],
                         output_file=str(out), format_type='xml')
    _validate_ds(out, 4, 0, 'kraken_recognition_baseline')


def test_build_xml_bbox_dataset(resources, tmp_path):
    """`--linetype bbox` extracts bounding-box crops from XML sources, not
    just relabeled baseline extractions."""
    out = tmp_path / 'ds.arrow'
    build_binary_dataset(files=[str(resources / XML)],
                         output_file=str(out), format_type='xml',
                         linetype='bbox')
    _validate_ds(out, 4, 0, 'kraken_recognition_bbox')


def test_build_seg_dataset(resources, tmp_path):
    seg = XMLPage(resources / XML).to_container()
    out = tmp_path / 'ds.arrow'
    build_binary_dataset(files=[seg], output_file=str(out), format_type=None)
    _validate_ds(out, 4, 0, 'kraken_recognition_baseline')


def test_forced_type_dataset(resources, tmp_path):
    out = tmp_path / 'ds.arrow'
    build_binary_dataset(files=4 * [str(resources / '000236.png')],
                         output_file=str(out), format_type='path',
                         force_type='kraken_recognition_baseline')
    _validate_ds(out, 4, 0, 'kraken_recognition_baseline')


def test_force_type_invalid_value(resources, tmp_path):
    with pytest.raises(ValueError, match='force_type'):
        build_binary_dataset(files=[str(resources / XML)],
                             output_file=str(tmp_path / 'ds.arrow'),
                             format_type='xml', force_type='bogus_type')


def test_build_empty_dataset(resources, tmp_path):
    """Empty lines are retained (and counted) with skip_empty_lines off."""
    out = tmp_path / 'ds.arrow'
    build_binary_dataset(files=[str(resources / XML)],
                         output_file=str(out), format_type='xml',
                         skip_empty_lines=False)
    _validate_ds(out, 5, 1, 'kraken_recognition_baseline')


def test_force_type_mismatch_warning(resources, tmp_path, caplog):
    """Forcing a type contradicting the extracted line type warns once."""
    out = tmp_path / 'ds.arrow'
    with caplog.at_level(logging.WARNING):
        build_binary_dataset(files=[str(resources / XML)],
                             output_file=str(out), format_type='xml',
                             linetype='bbox',
                             force_type='kraken_recognition_baseline')
    _validate_ds(out, 4, 0, 'kraken_recognition_baseline')
    mismatches = [r for r in caplog.records
                  if 'Forcing dataset type' in r.message]
    assert len(mismatches) == 1


def test_build_image_error(resources, tmp_path, caplog):
    """Unreadable inputs are skipped with a warning naming the file."""
    bogus = str(resources / 'bogus_000236.png')
    out = tmp_path / 'ds.arrow'
    with caplog.at_level(logging.WARNING):
        build_binary_dataset(files=[bogus], output_file=str(out),
                             format_type='xml')
    _validate_ds(out, 0, 0, 'kraken_recognition_baseline')
    warnings_ = [r for r in caplog.records
                 if f'Invalid input file {bogus}' in r.message]
    assert len(warnings_) == 1


def test_alphabet_counts_metadata(resources, tmp_path):
    """The compiled metadata carries per-grapheme alphabet counts usable
    for codec construction."""
    out = tmp_path / 'ds.arrow'
    build_binary_dataset(files=[str(resources / XML)],
                         output_file=str(out), format_type='xml')
    meta = _validate_ds(out, 4, 0, 'kraken_recognition_baseline')
    assert meta['alphabet'] and all(isinstance(v, int)
                                    for v in meta['alphabet'].values())
    assert meta['legacy_polygons'] is False
