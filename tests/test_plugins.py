"""
Plugin/registry tests (reference: tests/test_plugins.py): model-class name
resolution (including the reference's class names as aliases), decorator
registration, task-model wrapping, and legacy-vs-new polygon extractor
selection plumbing.
"""
import pytest

from kraken_tpu.models.utils import create_model, register_model, _resolve


def test_builtin_model_names_resolve():
    from kraken_tpu.vgsl import VGSLModel
    from kraken_tpu.ro.layers import ROMLP
    from kraken_tpu.pretrain.layers import Wav2Vec2Mask
    assert _resolve('TorchVGSLModel') is VGSLModel   # reference alias
    assert _resolve('VGSLModel') is VGSLModel
    assert _resolve('ROMLP') is ROMLP
    assert _resolve('Wav2Vec2Mask') is Wav2Vec2Mask


def test_unknown_model_name():
    with pytest.raises(ValueError, match='No model class registered'):
        _resolve('NoSuchModelClass')


def test_register_model_decorator():
    @register_model('_TestModel')
    class _TestModel:
        def __init__(self, value=1):
            self.value = value

    m = create_model('_TestModel', value=7)
    assert m.value == 7


def test_registry_load_model_wraps_tasks(resources):
    from kraken_tpu.registry import load_model
    from kraken_tpu.tasks import RecognitionTaskModel
    wrapped = load_model(resources / 'overfit.mlmodel')
    assert isinstance(wrapped['recognition'], RecognitionTaskModel)


def test_legacy_polygon_extractor_selected(resources, monkeypatch):
    """A model trained with legacy polygons drives extract_polygons(legacy=True)."""
    from PIL import Image

    import kraken_tpu.inference.recognition as rec
    from kraken_tpu.configs import RecognitionInferenceConfig
    from kraken_tpu.containers import BaselineLine, Segmentation
    from kraken_tpu.models import load_models

    calls = []
    orig = rec.extract_polygons

    def spy(im, seg, legacy=False):
        calls.append(legacy)
        return orig(im, seg, legacy=legacy)

    monkeypatch.setattr(rec, 'extract_polygons', spy)

    im = Image.open(resources / '000236.png')
    seg = Segmentation(type='baselines', imagename='000236.png',
                       text_direction='horizontal-lr', script_detection=False,
                       lines=[BaselineLine(id='l0', baseline=[[30, 30], [300, 30]],
                                           boundary=[[30, 15], [300, 15],
                                                     [300, 45], [30, 45]])])
    model = load_models(resources / 'overfit.mlmodel')[0]
    assert model.use_legacy_polygons

    model.prepare_for_inference(RecognitionInferenceConfig(num_line_workers=0))
    list(model.predict(im, seg))
    assert calls == [True]

    # --no-legacy-polygons forces the new extractor
    calls.clear()
    model.prepare_for_inference(RecognitionInferenceConfig(num_line_workers=0,
                                                           no_legacy_polygons=True))
    list(model.predict(im, seg))
    assert calls == [False]


def test_legacy_polygons_training_flag(resources, tmp_path):
    """--legacy-polygons on XML training data flags the resulting model."""
    from kraken_tpu.configs import (RecognitionTrainingConfig,
                                    RecognitionTrainingDataConfig)
    from kraken_tpu.train import (KrakenTrainer, RecognitionDataModule,
                                  RecognitionModel)

    for legacy in (True, False):
        config = RecognitionTrainingConfig(
            spec='[1,32,0,1 Cr3,3,4,2,2 S1(1x0)1,3 Lbx8 Do0.1,2]',
            epochs=1, lrate=1e-3,
            checkpoint_path=str(tmp_path / f'model{legacy}'))
        data_config = RecognitionTrainingDataConfig(
            format_type='xml',
            training_data=[str(resources / '170025120000003,0074.xml')],
            batch_size=1)
        data_config.legacy_polygons = legacy
        dm = RecognitionDataModule(data_config)
        module = RecognitionModel(config)
        KrakenTrainer(config, fast_dev_run=True).fit(module, dm)
        assert module.net.use_legacy_polygons == legacy


def test_legacy_polygons_binary_status(resources, tmp_path):
    """Arrow datasets record whether they were compiled with legacy polygons
    and the trained model inherits that flag."""
    from kraken_tpu.dataset import ArrowIPCRecognitionDataset
    from kraken_tpu.dataset.arrow import build_binary_dataset

    out = tmp_path / 'legacy.arrow'
    build_binary_dataset([str(resources / '170025120000003,0074.xml')],
                         output_file=str(out), format_type='xml',
                         legacy_polygons=True)
    ds = ArrowIPCRecognitionDataset()
    ds.add(str(out))
    assert ds.legacy_polygons_status is True


def _fake_entry_point(name, obj):
    class _EP:
        def __init__(self):
            self.name = name
            self.value = f'fake_plugin:{name}'

        def load(self):
            return obj
    return _EP()


def test_third_party_cli_subcommand_loads(monkeypatch):
    """A synthetic kraken.cli plugin subcommand is discovered and invocable
    (reference: kraken/kraken.py:818-819, tests/test_plugins.py:21-50)."""
    import click
    from click.testing import CliRunner
    import importlib.metadata
    from kraken_tpu.registry import register_cli_plugins

    @click.command('frobnicate')
    def frobnicate():
        click.echo('frobnicated!')

    @click.group()
    def fake_cli():
        pass

    real_eps = importlib.metadata.entry_points

    def fake_eps(group=None, **kw):
        if group == 'kraken.cli':
            return [_fake_entry_point('frobnicate', frobnicate)]
        return real_eps(group=group, **kw)

    monkeypatch.setattr(importlib.metadata, 'entry_points', fake_eps)
    register_cli_plugins(fake_cli, 'kraken.cli')
    assert 'frobnicate' in fake_cli.commands
    result = CliRunner().invoke(fake_cli, ['frobnicate'])
    assert result.exit_code == 0 and 'frobnicated!' in result.output


def test_cli_plugin_does_not_shadow_first_party(monkeypatch):
    """Same-named plugins must not replace built-in subcommands."""
    import click
    import importlib.metadata
    from kraken_tpu.registry import register_cli_plugins

    @click.command('native')
    def native():
        pass

    @click.command('native')
    def evil():
        pass

    @click.group()
    def fake_cli():
        pass
    fake_cli.add_command(native, name='native')

    monkeypatch.setattr(importlib.metadata, 'entry_points',
                        lambda group=None, **kw: [_fake_entry_point('native', evil)])
    register_cli_plugins(fake_cli, 'kraken.cli')
    assert fake_cli.commands['native'] is native


def test_broken_cli_plugin_is_skipped(monkeypatch):
    """A plugin whose import explodes is skipped, not fatal."""
    import click
    import importlib.metadata
    from kraken_tpu.registry import register_cli_plugins

    class _Broken:
        name = 'broken'
        value = 'nope:nope'

        def load(self):
            raise ImportError('nope')

    @click.group()
    def fake_cli():
        pass

    monkeypatch.setattr(importlib.metadata, 'entry_points',
                        lambda group=None, **kw: [_Broken()])
    register_cli_plugins(fake_cli, 'kraken.cli')
    assert 'broken' not in fake_cli.commands


def test_kraken_ketos_cli_plugin_hooks_active():
    """The real CLI groups run plugin discovery at import time."""
    from kraken_tpu.kraken import cli as kraken_cli
    from kraken_tpu.ketos import cli as ketos_cli
    # first-party commands are present (discovery must not have broken them)
    for cmd in ('binarize', 'segment', 'ocr', 'show', 'list', 'get'):
        assert cmd in kraken_cli.commands
    for cmd in ('train', 'test', 'segtrain', 'segtest', 'rotrain', 'roadd',
                'compile', 'convert', 'pretrain', 'publish'):
        assert cmd in ketos_cli.commands


def test_resolve_config_builtins():
    from kraken_tpu.configs import (RecognitionTrainingConfig, resolve_config)
    assert resolve_config('RecognitionTrainingConfig') is RecognitionTrainingConfig
    with pytest.raises(ValueError, match='No config class'):
        resolve_config('NoSuchConfig')


def test_register_config_decorator_and_entry_point(monkeypatch):
    import importlib.metadata
    from kraken_tpu.configs import Config, register_config, resolve_config

    @register_config
    class _PluginConfig(Config):
        pass
    assert resolve_config('_PluginConfig') is _PluginConfig

    class _EPConfig(Config):
        pass
    monkeypatch.setattr(importlib.metadata, 'entry_points',
                        lambda group=None, **kw: [_fake_entry_point('_EPConfig', _EPConfig)]
                        if group == 'kraken.configs' else [])
    assert resolve_config('_EPConfig') is _EPConfig


def test_checkpoint_records_config_class(resources, tmp_path):
    """Checkpoints carry config_class and re-inflate through the registry."""
    from kraken_tpu.configs import RecognitionTrainingConfig
    from kraken_tpu.train import (config_from_checkpoint, load_checkpoint,
                                  save_checkpoint)
    from kraken_tpu.models import load_models

    net = load_models(resources / 'overfit.mlmodel')[0]
    path = tmp_path / 'ckpt.safetensors'
    config = RecognitionTrainingConfig(lrate=0.25, epochs=7)
    save_checkpoint(net, None, path, epoch=3,
                    hyper_params={'config_class': type(config).__name__,
                                  **vars(config)})
    _, _, meta = load_checkpoint(path)
    restored = config_from_checkpoint(meta)
    assert isinstance(restored, RecognitionTrainingConfig)
    assert restored.lrate == 0.25
    assert restored.epochs == 7


def test_writer_plugin_format(monkeypatch, resources, tmp_path):
    """write_models dispatches unknown formats to kraken.writers plugins."""
    import importlib.metadata
    from kraken_tpu.models import load_models, write_models

    written = {}

    def fake_writer(models, path):
        written['models'] = models
        written['path'] = path

    monkeypatch.setattr(importlib.metadata, 'entry_points',
                        lambda group=None, **kw: [_fake_entry_point('customfmt', fake_writer)]
                        if group == 'kraken.writers' else [])
    models = load_models(resources / 'overfit.mlmodel')
    write_models(models, tmp_path / 'out.custom', format='customfmt')
    assert written['models'] is models
    with pytest.raises(ValueError, match='Unknown model format'):
        write_models(models, tmp_path / 'out.x', format='doesnotexist')
