"""
Smoke tests for the contrib maintenance/visualization scripts: each exposes
a click CLI whose --help must render (catching import/syntax/option-wiring
errors without running full pipelines).
"""
import importlib
from pathlib import Path

import pytest
from click.testing import CliRunner

CONTRIB = sorted(p.stem for p in
                 (Path(__file__).parent.parent / 'kraken_tpu' / 'contrib').glob('*.py')
                 if p.stem != '__init__')


@pytest.mark.parametrize('name', CONTRIB)
def test_contrib_help(name):
    mod = importlib.import_module(f'kraken_tpu.contrib.{name}')
    cli = getattr(mod, 'cli', None)
    assert cli is not None, f'{name} has no click entry point `cli`'
    result = CliRunner().invoke(cli, ['--help'])
    assert result.exit_code == 0, result.output


def test_print_word_spreader_share_space(tmp_path):
    (tmp_path / 'in').mkdir()
    (tmp_path / 'in' / 't.html').write_text(
        '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
        '<div class="ocr_page" title="bbox 0 0 1000 1000">'
        '<span class="ocr_line" title="bbox 10 10 900 50">'
        '<span class="ocrx_word" title="bbox 10 10 100 50">foo</span>'
        '<span class="ocrx_word" title="bbox 100 10 120 50"> </span>'
        '<span class="ocrx_word" title="bbox 120 10 300 50">bar</span>'
        '</span></div></body></html>')
    from kraken_tpu.contrib.print_word_spreader import cli
    result = CliRunner().invoke(cli, ['--input-dir', str(tmp_path / 'in'),
                                      '--output-dir', str(tmp_path / 'out'), '-s'])
    assert result.exit_code == 0, result.output
    out = (tmp_path / 'out' / 't.html').read_text()
    assert out.count('ocrx_word') == 2  # space span removed
    assert 'bbox 10 10 108 50' in out   # previous word widened into the gap


def test_extract_lines_xml(tmp_path):
    from pathlib import Path
    from kraken_tpu.contrib.extract_lines import cli
    resources = Path(__file__).parent / 'resources'
    result = CliRunner().invoke(cli, ['-f', 'xml', '-o', str(tmp_path),
                                      str(resources / '170025120000003,0074.xml')])
    assert result.exit_code == 0, result.output
    pngs = list(tmp_path.glob('*.png'))
    txts = list(tmp_path.glob('*.gt.txt'))
    assert len(pngs) > 10
    assert len(txts) == len(pngs)


def test_repolygonize(tmp_path):
    import shutil
    from pathlib import Path
    from kraken_tpu.contrib.repolygonize import cli
    resources = Path(__file__).parent / 'resources'
    shutil.copy(resources / '170025120000003,0074.xml', tmp_path / 'page.xml')
    shutil.copy(resources / '170025120000003,0074.jpg', tmp_path / '170025120000003,0074.jpg')
    result = CliRunner().invoke(cli, ['-f', 'xml', str(tmp_path / 'page.xml')])
    assert result.exit_code == 0, result.output
    out = tmp_path / 'page.repoly.xml'
    assert out.exists()
    from kraken_tpu.xml import XMLPage
    seg = XMLPage(out).to_container()
    assert sum(1 for line in seg.lines if line.boundary) > 10


def test_set_seg_options(tmp_path):
    import jax
    from pathlib import Path
    from kraken_tpu.contrib.set_seg_options import cli
    from kraken_tpu.models import load_models, write_models
    from kraken_tpu.vgsl import VGSLModel

    model = VGSLModel(vgsl='[1,64,0,3 Cr3,3,4,2,2 Gn2 O2l4]',
                      rng=jax.random.PRNGKey(0))
    model.model_type = 'segmentation'
    model.user_metadata['class_mapping'] = {'aux': {'_start_separator': 0,
                                                    '_end_separator': 1},
                                            'baselines': {'default': 2},
                                            'regions': {'text': 3}}
    path = tmp_path / 'seg.safetensors'
    write_models([model], path)
    result = CliRunner().invoke(cli, ['-br', 'text', '--topline', str(path)])
    assert result.exit_code == 0, result.output
    reloaded = load_models(path)[0]
    assert reloaded.user_metadata['bounding_regions'] == ['text']
    assert reloaded.user_metadata['topline'] is True


def test_per_file_cer(tmp_path):
    import shutil
    from pathlib import Path
    from kraken_tpu.contrib.test_per_file import cli
    resources = Path(__file__).parent / 'resources'
    result = CliRunner().invoke(cli, ['-m', str(resources / 'overfit.mlmodel'),
                                      '-f', 'xml',
                                      str(resources / '170025120000003,0074.xml')])
    assert result.exit_code == 0, result.output
    assert 'TOTAL' in result.output and 'CER' in result.output


def test_segmentation_overlay_from_xml(tmp_path):
    import shutil
    from pathlib import Path
    from kraken_tpu.contrib.segmentation_overlay import cli
    resources = Path(__file__).parent / 'resources'
    shutil.copy(resources / '170025120000003,0074.xml', tmp_path / 'page.xml')
    shutil.copy(resources / '170025120000003,0074.jpg', tmp_path / '170025120000003,0074.jpg')
    result = CliRunner().invoke(cli, ['-f', 'xml', str(tmp_path / 'page.xml')])
    assert result.exit_code == 0, result.output
    assert list(tmp_path.glob('*.overlay.png')), result.output


def test_recognition_boxes(tmp_path):
    import shutil
    from pathlib import Path
    from kraken_tpu.contrib.recognition_boxes import cli
    resources = Path(__file__).parent / 'resources'
    shutil.copy(resources / 'bw.png', tmp_path / 'bw.png')
    result = CliRunner().invoke(cli, ['-m', str(resources / 'overfit.mlmodel'),
                                      str(tmp_path / 'bw.png')])
    assert result.exit_code == 0, result.output
    assert (tmp_path / 'bw.boxes.png').exists() or list(tmp_path.glob('*.boxes.png')), result.output


def test_forced_alignment_overlay(tmp_path):
    import shutil
    from pathlib import Path
    from kraken_tpu.contrib.forced_alignment_overlay import cli
    resources = Path(__file__).parent / 'resources'
    shutil.copy(resources / '170025120000003,0074.xml', tmp_path / 'page.xml')
    shutil.copy(resources / '170025120000003,0074.jpg', tmp_path / '170025120000003,0074.jpg')
    result = CliRunner().invoke(cli, ['-m', str(resources / 'overfit.mlmodel'),
                                      '-f', 'xml', str(tmp_path / 'page.xml')])
    assert result.exit_code == 0, result.output
    assert list(tmp_path.glob('*.align.png')), result.output


def test_heatmap_overlay(tmp_path):
    import jax
    import shutil
    from pathlib import Path
    from kraken_tpu.contrib.heatmap_overlay import cli
    from kraken_tpu.models import write_models
    from kraken_tpu.vgsl import VGSLModel

    model = VGSLModel(vgsl='[1,128,0,3 Cr3,3,8,2,2 Gn2 O2l4]', rng=jax.random.PRNGKey(0))
    model.model_type = 'segmentation'
    model.user_metadata['class_mapping'] = {'aux': {'_start_separator': 0, '_end_separator': 1},
                                            'baselines': {'default': 2}, 'regions': {'text': 3}}
    seg_model = tmp_path / 'seg.safetensors'
    write_models([model], seg_model)
    resources = Path(__file__).parent / 'resources'
    shutil.copy(resources / 'bw.png', tmp_path / 'bw.png')
    result = CliRunner().invoke(cli, ['-i', str(seg_model), str(tmp_path / 'bw.png')])
    assert result.exit_code == 0, result.output
    assert (tmp_path / 'bw.png.heat.png').exists()
