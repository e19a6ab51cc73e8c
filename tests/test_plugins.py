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
