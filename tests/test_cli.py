"""
CLI tests (reference: tests/test_cli.py): real click invocations of the
kraken pipeline and ketos tooling on the test corpus.
"""
import os
import tempfile

import pytest
from click.testing import CliRunner
from PIL import Image

from kraken_tpu.kraken import cli as kraken_cli
from kraken_tpu.ketos import cli as ketos_cli


@pytest.fixture
def runner():
    return CliRunner()


def test_binarize(runner, resources, tmp_path):
    out = tmp_path / 'bin.png'
    result = runner.invoke(kraken_cli, ['-i', str(resources / 'input.jpg'), str(out),
                                        '-r', 'binarize'])
    assert result.exit_code == 0, result.output
    with Image.open(out) as im:
        assert len(im.convert('L').getcolors(2)) == 2


def test_segment_legacy(runner, resources, tmp_path):
    out = tmp_path / 'seg.json'
    result = runner.invoke(kraken_cli, ['-i', str(resources / 'bw.png'), str(out),
                                        '-r', 'segment', '-x'])
    assert result.exit_code == 0, result.output
    import json
    seg = json.loads(out.read_text())
    assert seg['type'] == 'bbox'
    assert len(seg['lines']) > 20


def test_segment_ocr_native(runner, resources, tmp_path):
    out = tmp_path / 'out.txt'
    result = runner.invoke(kraken_cli, ['-i', str(resources / 'bw.png'), str(out),
                                        '-r', 'segment', '-x',
                                        'ocr', '-m', str(resources / 'overfit.mlmodel'),
                                        '--num-line-workers', '0'])
    assert result.exit_code == 0, result.output
    lines = out.read_text().splitlines()
    assert len(lines) == 30


def test_segment_ocr_alto(runner, resources, tmp_path):
    out = tmp_path / 'out.xml'
    result = runner.invoke(kraken_cli, ['-a', '-i', str(resources / 'bw.png'), str(out),
                                        '-r', 'segment', '-x',
                                        'ocr', '-m', str(resources / 'overfit.mlmodel'),
                                        '--num-line-workers', '0'])
    assert result.exit_code == 0, result.output
    from lxml import etree
    doc = etree.parse(str(out))
    with open(resources / 'alto-4-3.xsd') as fp:
        etree.XMLSchema(etree.parse(fp)).assertValid(doc)


def test_ocr_xml_input(runner, resources, tmp_path):
    """XML input mode: segmentation from an ALTO/PageXML file."""
    out = tmp_path / 'out.txt'
    result = runner.invoke(kraken_cli, ['-f', 'xml',
                                        '-i', str(resources / '170025120000003,0074.xml'), str(out),
                                        '-r',
                                        'ocr', '-m', str(resources / 'overfit.mlmodel'),
                                        '--num-line-workers', '0'])
    assert result.exit_code == 0, result.output
    assert len(out.read_text().splitlines()) > 30


def test_ocr_no_segmentation(runner, resources, tmp_path):
    out = tmp_path / 'out.txt'
    result = runner.invoke(kraken_cli, ['-i', str(resources / '000236.png'), str(out),
                                        '-r',
                                        'ocr', '-s', '-m', str(resources / 'overfit.mlmodel'),
                                        '--num-line-workers', '0'])
    assert result.exit_code == 0, result.output
    assert out.read_text().strip()


def test_ketos_compile(runner, resources, tmp_path):
    out = tmp_path / 'ds.arrow'
    result = runner.invoke(ketos_cli, ['compile', '-f', 'path',
                                       '-o', str(out),
                                       str(resources / 'merge_tests' / '0006.jpg'),
                                       str(resources / 'merge_tests' / '0007.jpg')])
    assert result.exit_code == 0, result.output
    assert out.exists()
    from kraken_tpu.dataset.recognition import ArrowIPCRecognitionDataset
    ds = ArrowIPCRecognitionDataset()
    ds.add(out)
    assert len(ds) == 2


def test_ketos_convert(runner, resources, tmp_path):
    from kraken_tpu.models import load_models
    from kraken_tpu.train import save_checkpoint
    model = load_models(resources / 'overfit_bl.safetensors')[0]
    ckpt = tmp_path / 'ckpt.safetensors'
    save_checkpoint(model, None, ckpt, epoch=3)
    out = tmp_path / 'converted.safetensors'
    result = runner.invoke(ketos_cli, ['convert', '-o', str(out), str(ckpt)])
    assert result.exit_code == 0, result.output
    reloaded = load_models(out)[0]
    assert reloaded.codec.c2l == model.codec.c2l
