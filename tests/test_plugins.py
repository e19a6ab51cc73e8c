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
