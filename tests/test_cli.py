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


def test_segment_neural_cli(runner, resources, tmp_path):
    """CLI `segment -bl` with a (random-weight) neural seg model produces a
    structurally valid baseline Segmentation."""
    import jax
    import json
    from kraken_tpu.models import write_models
    from kraken_tpu.vgsl import VGSLModel

    model = VGSLModel(vgsl='[1,128,0,3 Cr3,3,8,2,2 Gn2 Cr3,3,16,2,2 Gn2 O2l4]',
                      rng=jax.random.PRNGKey(0))
    model.model_type = 'segmentation'
    model.user_metadata['class_mapping'] = {'aux': {'_start_separator': 0,
                                                    '_end_separator': 1},
                                            'baselines': {'default': 2},
                                            'regions': {'text': 3}}
    seg_model = tmp_path / 'seg.safetensors'
    write_models([model], seg_model)

    out = tmp_path / 'seg.json'
    result = runner.invoke(kraken_cli, ['-i', str(resources / 'bw.png'), str(out),
                                        '-r', 'segment', '-bl',
                                        '-i', str(seg_model)])
    assert result.exit_code == 0, result.output
    seg = json.loads(out.read_text())
    assert seg['type'] == 'baselines'


def test_segment_packaged_default_model(runner, resources, tmp_path):
    """`segment -bl` with no -i model falls back to the packaged
    blla.safetensors demonstrator and produces baselines on the annotated
    fixture page (closes the reference's packaged-data row: the default
    model location kraken/kraken.py:43 resolves out of the box)."""
    import json
    from kraken_tpu.kraken import SEGMENTATION_DEFAULT_MODEL

    assert SEGMENTATION_DEFAULT_MODEL.exists()
    out = tmp_path / 'seg.json'
    result = runner.invoke(
        kraken_cli, ['-i', str(resources / '170025120000003,0074.jpg'),
                     str(out), '-r', 'segment', '-bl'])
    assert result.exit_code == 0, result.output
    seg = json.loads(out.read_text())
    assert seg['type'] == 'baselines'
    assert len(seg['lines']) > 30


def test_pretrain_to_recognition_flow(resources, tmp_path):
    """A pretraining checkpoint warm-starts recognition training: the
    __pretrain__ parameter subtree is dropped and the backbone weights load."""
    from kraken_tpu.configs import (PretrainingConfig, RecognitionTrainingConfig,
                                    RecognitionTrainingDataConfig)
    from kraken_tpu.pretrain.model import RecognitionPretrainModel
    from kraken_tpu.train import (KrakenTrainer, RecognitionDataModule,
                                  RecognitionModel)

    spec = '[1,32,0,1 Cr3,3,4,2,2 S1(1x0)1,3 Lbx8 Do0.1,2]'
    pre_config = PretrainingConfig(spec=spec, epochs=1, lrate=1e-4,
                                   mask_width=2, mask_prob=0.5, num_negatives=4,
                                   checkpoint_path=str(tmp_path / 'pre'))
    data_config = RecognitionTrainingDataConfig(
        format_type='binary',
        training_data=[str(resources / 'merge_tests' / 'base.arrow')],
        batch_size=1)
    dm = RecognitionDataModule(data_config)
    pre_module = RecognitionPretrainModel(pre_config)
    KrakenTrainer(pre_config, fast_dev_run=True).fit(pre_module, dm)
    ckpts = sorted(tmp_path.glob('pre_*.safetensors'))
    assert ckpts

    rec_config = RecognitionTrainingConfig(spec=spec, epochs=1, lrate=1e-3,
                                           resize='new',
                                           checkpoint_path=str(tmp_path / 'rec'))
    module = RecognitionModel.load_from_weights(rec_config, ckpts[0])
    assert '__pretrain__' not in module.net.params
    KrakenTrainer(rec_config, fast_dev_run=True).fit(module, RecognitionDataModule(data_config))
    assert module.net.codec is not None


def test_ketos_test_cli(runner, resources, tmp_path):
    """ketos test evaluates a model and writes an accuracy report."""
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        result = runner.invoke(ketos_cli, ['test',
                                           '-m', str(resources / 'merge_tests' / 'merge_codec_nfd.mlmodel'),
                                           '-f', 'binary',
                                           str(resources / 'merge_tests' / 'base.arrow')])
    finally:
        os.chdir(cwd)
    assert result.exit_code == 0, result.output
    assert 'accuracy' in result.output.lower() or 'report' in result.output.lower()


def test_ketos_segtrain_cli(runner, resources, tmp_path):
    """ketos segtrain runs one epoch and writes checkpoints."""
    result = runner.invoke(ketos_cli, ['segtrain', '-N', '1',
                                       '-o', str(tmp_path / 'seg'),
                                       '-s', '[1,64,0,3 Cr3,3,4,2,2 Gn2]',
                                       str(resources / '170025120000003,0074.xml')])
    assert result.exit_code == 0, result.output
    assert list(tmp_path.glob('seg_*.safetensors')), result.output


def test_ketos_segtest_cli(runner, resources, tmp_path):
    """ketos segtest evaluates a trained seg model and prints metrics."""
    result = runner.invoke(ketos_cli, ['segtrain', '-N', '1',
                                       '-o', str(tmp_path / 'seg'),
                                       '-s', '[1,64,0,3 Cr3,3,4,2,2 Gn2]',
                                       str(resources / '170025120000003,0074.xml')])
    assert result.exit_code == 0, result.output
    best = tmp_path / 'seg_best.safetensors'
    assert best.exists()
    result = runner.invoke(ketos_cli, ['segtest', '-m', str(best),
                                       str(resources / '170025120000003,0074.xml')])
    assert result.exit_code == 0, result.output
    assert 'val_mean_iu' in result.output


def test_ketos_rotrain_roadd_cli(runner, resources, tmp_path):
    """rotrain trains an RO model; roadd embeds it into a seg model."""
    result = runner.invoke(ketos_cli, ['rotrain', '-N', '1',
                                       '-o', str(tmp_path / 'ro'),
                                       str(resources / '170025120000003,0074.xml')])
    assert result.exit_code == 0, result.output
    ro_best = tmp_path / 'ro_best.safetensors'
    assert ro_best.exists(), result.output

    # train a tiny seg model to attach the RO model to
    result = runner.invoke(ketos_cli, ['segtrain', '-N', '1',
                                       '-o', str(tmp_path / 'seg'),
                                       '-s', '[1,64,0,3 Cr3,3,4,2,2 Gn2]',
                                       str(resources / '170025120000003,0074.xml')])
    assert result.exit_code == 0, result.output
    result = runner.invoke(ketos_cli, ['roadd',
                                       '-i', str(tmp_path / 'seg_best.safetensors'),
                                       '-r', str(ro_best),
                                       '-o', str(tmp_path / 'seg_ro.safetensors')])
    assert result.exit_code == 0, result.output
    from kraken_tpu.models import load_models
    models = load_models(tmp_path / 'seg_ro.safetensors')
    assert any('reading_order' in getattr(m, 'model_type', []) for m in models), \
        [getattr(m, 'model_type', None) for m in models]


def test_ketos_pretrain_cli(runner, resources, tmp_path):
    result = runner.invoke(ketos_cli, ['pretrain', '-N', '1', '-f', 'binary',
                                       '-o', str(tmp_path / 'pre'),
                                       '-s', '[1,32,0,1 Cr3,3,4,2,2 S1(1x0)1,3 Lbx8 Do0.1,2]',
                                       '--mask-width', '2', '--num-negatives', '4',
                                       str(resources / 'merge_tests' / 'base.arrow')])
    assert result.exit_code == 0, result.output
    assert list(tmp_path.glob('pre_*.safetensors')), result.output


def test_ketos_yaml_config(runner, resources, tmp_path):
    """Reference-style YAML experiment files work at group and subcommand level."""
    cfg = tmp_path / 'exp.yml'
    cfg.write_text(
        'train:\n'
        '  epochs: 1\n'
        '  lrate: 0.002\n'
        "  spec: '[1,32,0,1 Cr3,3,4,2,2 S1(1x0)1,3 Lbx8 Do0.1,2]'\n"
        '  format_type: binary\n')
    for args in (['train', '--config', str(cfg)],
                 ['--config', str(cfg), 'train']):
        out = tmp_path / f'm{len(args)}'
        result = runner.invoke(ketos_cli, args + ['-o', str(out),
                                                  str(resources / 'merge_tests' / 'base.arrow')])
        assert result.exit_code == 0, result.output
        assert list(tmp_path.glob(f'{out.name}_*.safetensors')), result.output


def test_binarize_device_accel(runner, resources, tmp_path):
    """--accel device runs the jitted nlbin and produces a bitonal image."""
    out = tmp_path / 'bin.png'
    result = runner.invoke(kraken_cli, ['-i', str(resources / 'input.jpg'), str(out),
                                        '-r', 'binarize', '--accel', 'device'])
    assert result.exit_code == 0, result.output
    with Image.open(out) as im:
        assert len(im.convert('L').getcolors(2)) == 2


def test_combined_multimodel_container(runner, resources, tmp_path):
    """A single safetensors file holding seg + rec models drives the full
    segment -bl → ocr pipeline (task wrappers filter by model type)."""
    import jax
    from kraken_tpu.models import load_models, write_models
    from kraken_tpu.vgsl import VGSLModel

    seg = VGSLModel(vgsl='[1,128,0,3 Cr3,3,8,2,2 Gn2 O2l4]', rng=jax.random.PRNGKey(0))
    seg.model_type = 'segmentation'
    seg.user_metadata['class_mapping'] = {'aux': {'_start_separator': 0, '_end_separator': 1},
                                          'baselines': {'default': 2}, 'regions': {'text': 3}}
    rec = load_models(resources / 'overfit.mlmodel')[0]
    combined = tmp_path / 'combined.safetensors'
    write_models([seg, rec], combined)

    out = tmp_path / 'out.txt'
    result = runner.invoke(kraken_cli, ['-i', str(resources / 'bw.png'), str(out),
                                        '-r', 'segment', '-bl', '-i', str(combined),
                                        'ocr', '-m', str(combined),
                                        '--num-line-workers', '0'])
    assert result.exit_code == 0, result.output
    assert out.exists()


def test_segment_with_neural_ro(runner, resources, tmp_path):
    """A seg model with an embedded RO MLP applies neural reading order.

    The RO head is attached to the TRAINED blla_small fixture model (a
    freshly-initialized 1-epoch seg net emits degenerate baselines that
    rarely survive polygonization, leaving the RO path unexercised).
    """
    import json
    # seed: model init draws from the numpy RNG (vgsl.py)
    r = runner.invoke(ketos_cli, ['-s', '42',
                                  'rotrain', '-N', '1', '-o', str(tmp_path / 'ro'),
                                  str(resources / '170025120000003,0074.xml')])
    assert r.exit_code == 0, r.output
    r = runner.invoke(ketos_cli, ['roadd',
                                  '-i', str(resources / 'blla_small.safetensors'),
                                  '-r', str(tmp_path / 'ro_best.safetensors'),
                                  '-o', str(tmp_path / 'seg_ro.safetensors')])
    assert r.exit_code == 0, r.output

    out = tmp_path / 'seg.json'
    r = runner.invoke(kraken_cli, ['-i', str(resources / '170025120000003,0074.jpg'),
                                   str(out), '-r', 'segment', '-bl',
                                   '-i', str(tmp_path / 'seg_ro.safetensors')])
    assert r.exit_code == 0, r.output
    seg = json.loads(out.read_text())
    assert seg['type'] == 'baselines'
    # the neural order must cover every detected line exactly once
    assert len(seg['lines']) > 30
    assert 'line_orders' in seg and seg['line_orders'], \
        'neural RO model attached but no line order was emitted'
    order = seg['line_orders'][0]
    assert order, 'emitted neural line order is empty'
    assert sorted(order) == list(range(len(seg['lines'])))


def test_ocr_xml_bbox_linetype(runner, resources, tmp_path):
    """--linetype bbox parses XML lines as boxes and recognizes them."""
    import shutil
    shutil.copy(resources / '170025120000003,0074.xml', tmp_path / 'page.xml')
    shutil.copy(resources / '170025120000003,0074.jpg',
                tmp_path / '170025120000003,0074.jpg')
    out = tmp_path / 'out.txt'
    result = runner.invoke(kraken_cli, ['-f', 'xml', '-i', str(tmp_path / 'page.xml'),
                                        str(out), '-r',
                                        'ocr', '-m', str(resources / 'overfit.mlmodel'),
                                        '--linetype', 'bbox',
                                        '--num-line-workers', '0'])
    assert result.exit_code == 0, result.output
    assert len(out.read_text().splitlines()) == 44


def test_ketos_segtrain_class_mapping_config(runner, resources, tmp_path):
    """Explicit class mappings flow from a YAML experiment file through the
    hidden --line-class-mapping passthrough (reference:
    kraken/ketos/segmentation.py:226-252)."""
    import yaml
    cfg = tmp_path / 'exp.yaml'
    cfg.write_text(yaml.safe_dump({
        'segtrain': {'line_class_mapping': [['default', 2], ['*', 2]],
                     'region_class_mapping': [['*', 3]]}}))
    result = runner.invoke(ketos_cli, ['segtrain', '--config', str(cfg),
                                       '-N', '1', '-o', str(tmp_path / 'seg'),
                                       '-s', '[1,64,0,3 Cr3,3,4,2,2 Gn2]',
                                       str(resources / '170025120000003,0074.xml')])
    assert result.exit_code == 0, result.output
    from kraken_tpu.models import load_models
    net = load_models(tmp_path / 'seg_best.safetensors')[0]
    cm = net.user_metadata['class_mapping']
    assert set(cm['baselines'].values()) == {2}
    assert set(cm['regions'].values()) == {3}


def test_ketos_rotrain_class_mapping_from_ckpt(runner, resources, tmp_path):
    """rotrain can lift its class mapping from a segmentation checkpoint."""
    result = runner.invoke(ketos_cli, ['segtrain', '-N', '1',
                                       '-o', str(tmp_path / 'seg'),
                                       '-s', '[1,64,0,3 Cr3,3,4,2,2 Gn2]',
                                       str(resources / '170025120000003,0074.xml')])
    assert result.exit_code == 0, result.output
    ckpt = next(tmp_path.glob('seg_0.safetensors'))
    result = runner.invoke(ketos_cli, ['rotrain', '-N', '1',
                                       '-o', str(tmp_path / 'ro'),
                                       '--class-mapping-from-ckpt', str(ckpt),
                                       str(resources / '170025120000003,0074.xml')])
    assert result.exit_code == 0, result.output
    assert (tmp_path / 'ro_best.safetensors').exists()


def test_show_local_model_file(runner, resources):
    """kraken show on a local file prints the embedded metadata offline."""
    result = runner.invoke(kraken_cli, ['show', str(resources / 'overfit.mlmodel')])
    assert result.exit_code == 0, result.output
    assert 'model type: recognition' in result.output
    assert 'alphabet:' in result.output
