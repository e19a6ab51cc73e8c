"""
Legacy-vs-new polygon extractor selection across every entry path
(reference: tests/test_newpolygons.py, 452 LoC): models trained with the
legacy extraction method must drive extract_polygons(legacy=True) through
the legacy rpred API, the kraken CLI, and the ketos test/train data paths —
unless force-disabled — and newly trained models must use (and be flagged
with) the new method.
"""
import warnings
from pathlib import Path

import pytest
from click.testing import CliRunner
from PIL import Image

from kraken_tpu.containers import BaselineLine, Segmentation
from kraken_tpu.kraken import cli as kraken_cli
from kraken_tpu.ketos import cli as ketos_cli
from kraken_tpu.lib.models import load_any
from kraken_tpu.rpred import rpred


@pytest.fixture(scope='module', autouse=True)
def quiet():
    warnings.filterwarnings('ignore')


@pytest.fixture
def spy_calls(monkeypatch):
    """Wraps extract_polygons at every import site, recording `legacy`."""
    import kraken_tpu.rpred as rpred_mod
    import kraken_tpu.inference.recognition as engine_mod
    import kraken_tpu.dataset.recognition as dataset_mod
    from kraken_tpu.lib.geometry import extract_polygons as orig

    calls = []

    def spy(im, seg, legacy=False):
        calls.append(legacy)
        return orig(im, seg, legacy=legacy)

    for mod in (rpred_mod, engine_mod, dataset_mod):
        monkeypatch.setattr(mod, 'extract_polygons', spy)
    return calls


@pytest.fixture
def bl_seg(resources):
    return Segmentation(type='baselines', imagename=resources / 'bw.png',
                        text_direction='horizontal-lr', script_detection=False,
                        lines=[BaselineLine(id='foo',
                                            baseline=[[0, 10], [2543, 10]],
                                            boundary=[[0, 0], [2543, 0], [2543, 155], [0, 155]])])


@pytest.mark.parametrize('model_file,force_new,expect_legacy', [
    ('overfit.mlmodel', False, True),           # old model -> legacy
    ('overfit.mlmodel', True, False),           # old model, forced new
    ('overfit_newpoly.mlmodel', False, False),  # new model -> new
])
def test_rpred_extractor_selection(resources, spy_calls, bl_seg,
                                   model_file, force_new, expect_legacy):
    im = Image.open(resources / 'bw.png')
    model = load_any(resources / model_file)
    pred = rpred(model, im, bl_seg, True, no_legacy_polygons=force_new)
    next(pred)
    assert spy_calls and all(c is expect_legacy for c in spy_calls)


@pytest.mark.parametrize('model_file,force_new,expect_legacy', [
    ('overfit_bl.safetensors', False, True),
    ('overfit_bl.safetensors', True, False),
    ('overfit_bl_newpoly.safetensors', False, False),
])
def test_krakencli_ocr_extractor_selection(resources, spy_calls, tmp_path,
                                           model_file, force_new, expect_legacy):
    args = ['-f', 'xml', '-i', str(resources / '170025120000003,0074-lite.xml'),
            str(tmp_path / 'out.txt'), 'ocr', '--num-line-workers', '0']
    if force_new:
        args += ['--no-legacy-polygons']
    args += ['-m', str(resources / model_file)]
    result = CliRunner().invoke(kraken_cli, args)
    assert result.exit_code == 0, result.output
    assert spy_calls and all(c is expect_legacy for c in spy_calls)


@pytest.mark.parametrize('model_file,force_new,expect_legacy', [
    ('overfit_bl.safetensors', False, True),
    ('overfit_bl.safetensors', True, False),
    ('overfit_bl_newpoly.safetensors', False, False),
])
def test_ketoscli_test_extractor_selection(resources, spy_calls, tmp_path,
                                           model_file, force_new, expect_legacy,
                                           monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = ['--workers', '0', 'test']
    if force_new:
        args += ['--no-legacy-polygons']
    args += ['-m', str(resources / model_file), '-f', 'xml',
             str(resources / '170025120000003,0074-lite.xml')]
    result = CliRunner().invoke(ketos_cli, args)
    assert result.exit_code == 0, result.output
    assert spy_calls and all(c is expect_legacy for c in spy_calls)


@pytest.mark.parametrize('force_legacy', [False, True])
def test_ketoscli_train_extractor_and_flag(resources, spy_calls, tmp_path,
                                           force_legacy):
    """Training on XML data uses the requested extractor and flags the
    resulting weights, which then drive inference the same way."""
    from kraken_tpu.models import load_models

    args = ['--workers', '0', 'train', '-f', 'xml', '-N', '1', '-q', 'fixed',
            '-o', str(tmp_path / 'model')]
    if force_legacy:
        args += ['--legacy-polygons']
    args += [str(resources / '170025120000003,0074-lite.xml')]
    result = CliRunner().invoke(ketos_cli, args)
    assert result.exit_code == 0, result.output
    assert spy_calls and all(c is force_legacy for c in spy_calls)
    best = tmp_path / 'model_best.safetensors'
    assert best.exists()
    assert load_models(best)[0].use_legacy_polygons == force_legacy


def test_arrow_compile_and_train_extractor(resources, spy_calls, tmp_path):
    """ketos compile records the extractor in the arrow metadata; training
    from that arrow inherits the flag without re-extracting polygons."""
    from kraken_tpu.dataset import ArrowIPCRecognitionDataset
    from kraken_tpu.dataset.arrow import build_binary_dataset
    from kraken_tpu.models import load_models

    for legacy in (False, True):
        out = tmp_path / f'poly{legacy}.arrow'
        spy_calls.clear()
        build_binary_dataset([str(resources / '170025120000003,0074-lite.xml')],
                             output_file=str(out), format_type='xml',
                             legacy_polygons=legacy)
        ds = ArrowIPCRecognitionDataset()
        ds.add(str(out))
        assert ds.legacy_polygons_status is legacy

        result = CliRunner().invoke(ketos_cli, [
            '--workers', '0', 'train', '-f', 'binary', '-N', '1', '-q', 'fixed',
            '-o', str(tmp_path / f'model{legacy}'), str(out)])
        assert result.exit_code == 0, result.output
        best = tmp_path / f'model{legacy}_best.safetensors'
        assert load_models(best)[0].use_legacy_polygons == legacy


@pytest.mark.parametrize('force_legacy', [False, True])
def test_ketoscli_finetune_old_model_extractor(resources, spy_calls, tmp_path,
                                               force_legacy):
    """Fine-tuning an old (legacy-flagged) model on XML data re-extracts
    with the NEW method unless --legacy-polygons forces it; the saved
    weights are re-flagged accordingly (reference:
    tests/test_newpolygons.py:247-282)."""
    from kraken_tpu.models import load_models

    args = ['--workers', '0', 'train', '-f', 'xml', '-N', '1', '-q', 'fixed',
            '-i', str(resources / 'overfit_bl.safetensors'), '--resize', 'union',
            '-o', str(tmp_path / 'model')]
    if force_legacy:
        args += ['--legacy-polygons']
    args += [str(resources / '170025120000003,0074-lite.xml')]
    result = CliRunner().invoke(ketos_cli, args)
    assert result.exit_code == 0, result.output
    assert spy_calls and all(c is force_legacy for c in spy_calls)
    best = tmp_path / 'model_best.safetensors'
    assert best.exists()
    assert load_models(best)[0].use_legacy_polygons == force_legacy


@pytest.mark.parametrize('load_old,force_legacy', [
    (False, False),   # new pretrain -> new
    (False, True),    # new pretrain, forced legacy
    (True, False),    # pretraining an old model -> new
])
def test_ketoscli_pretrain_extractor(resources, spy_calls, tmp_path,
                                     load_old, force_legacy):
    """ketos pretrain extraction-method selection (reference:
    tests/test_newpolygons.py:283-341)."""
    args = ['--workers', '0', 'pretrain', '-f', 'xml', '-N', '1', '-q', 'fixed',
            '-B', '2', '-o', str(tmp_path / 'model')]
    if force_legacy:
        args += ['--legacy-polygons']
    if load_old:
        # pretraining needs a recurrent layer; the shipped legacy fixtures
        # are conv-only, so flag a small RNN model legacy on the fly
        import jax
        from kraken_tpu.models import write_safetensors
        from kraken_tpu.vgsl import VGSLModel
        old = VGSLModel(vgsl='[1,48,0,1 Cr3,3,8,2,2 S1(1x0)1,3 Lbx16 O1c4]',
                        rng=jax.random.PRNGKey(0))
        old.model_type = ['recognition']
        old.use_legacy_polygons = True
        old_path = tmp_path / 'old_rnn.safetensors'
        write_safetensors([old], old_path)
        args += ['-i', str(old_path)]
    args += [str(resources / '170025120000003,0074-lite.xml')]
    result = CliRunner().invoke(ketos_cli, args)
    assert result.exit_code == 0, result.output
    assert spy_calls and all(c is force_legacy for c in spy_calls)


def _train_on_arrow(tmp_path, name, dsets, force_legacy=False, from_model=None):
    args = ['--workers', '0', 'train', '-f', 'binary', '-N', '1', '-q', 'fixed',
            '-o', str(tmp_path / name)]
    if force_legacy:
        args += ['--legacy-polygons']
    if from_model:
        args += ['-i', str(from_model), '--resize', 'union']
    args += [str(d) for d in dsets]
    return CliRunner().invoke(ketos_cli, args)


@pytest.fixture(scope='module')
def arrow_pair(resources, tmp_path_factory):
    """One legacy-compiled and one new-compiled arrow of the same page."""
    from kraken_tpu.dataset.arrow import build_binary_dataset
    root = tmp_path_factory.mktemp('arrows')
    out = {}
    for legacy in (False, True):
        p = root / f'poly{legacy}.arrow'
        build_binary_dataset([str(resources / '170025120000003,0074-lite.xml')],
                             output_file=str(p), format_type='xml',
                             legacy_polygons=legacy)
        out[legacy] = p
    return out


def test_arrow_status_coherence_warnings(resources, tmp_path, arrow_pair, caplog):
    """Training on an arrow whose recorded extraction status conflicts
    with the requested flag warns and lets the dataset status prevail
    (reference: tests/test_newpolygons.py:362-437, train/vgsl.py:209-223,
    565-593)."""
    import logging

    from kraken_tpu.models import load_models

    # old arrow + (default) new request: status True prevails, warns
    with caplog.at_level(logging.INFO):
        result = _train_on_arrow(tmp_path, 'm1', [arrow_pair[True]])
    assert result.exit_code == 0, result.output
    msgs = [r.message for r in caplog.records]
    assert any('Dataset legacy-polygon mode resolved to True' in m and
               r.levelno >= logging.WARNING
               for m, r in zip(msgs, caplog.records))
    assert any('trained model will be marked legacy-polygon' in m for m in msgs)
    assert load_models(tmp_path / 'm1_best.safetensors')[0].use_legacy_polygons is True

    # old arrow + forced legacy: coherent, no warning
    caplog.clear()
    with caplog.at_level(logging.INFO):
        result = _train_on_arrow(tmp_path, 'm2', [arrow_pair[True]], force_legacy=True)
    assert result.exit_code == 0, result.output
    warnings_ = [r.message for r in caplog.records if r.levelno >= logging.WARNING]
    assert not any('legacy-polygon mode resolved' in m for m in warnings_)
    assert not any('will be marked' in m or 're-marked' in m for m in warnings_)

    # new arrow + forced legacy: status False prevails, model flagged new
    caplog.clear()
    with caplog.at_level(logging.INFO):
        result = _train_on_arrow(tmp_path, 'm3', [arrow_pair[False]], force_legacy=True)
    assert result.exit_code == 0, result.output
    warnings_ = [r.message for r in caplog.records if r.levelno >= logging.WARNING]
    assert any('Dataset legacy-polygon mode resolved to False' in m for m in warnings_)
    assert any('trained model will be marked new-polygon' in m for m in warnings_)
    assert load_models(tmp_path / 'm3_best.safetensors')[0].use_legacy_polygons is False


def test_arrow_old_model_flag_update_warning(resources, tmp_path, arrow_pair, caplog):
    """Fine-tuning a legacy-flagged model on a new-polygon arrow warns that
    the model will be re-flagged to use the new extractor."""
    import logging

    from kraken_tpu.models import load_models

    with caplog.at_level(logging.INFO):
        result = _train_on_arrow(tmp_path, 'm4', [arrow_pair[False]],
                                 from_model=resources / 'overfit_bl.safetensors')
    assert result.exit_code == 0, result.output
    warnings_ = [r.message for r in caplog.records if r.levelno >= logging.WARNING]
    assert any('will be re-marked new-polygon' in m for m in warnings_)
    assert load_models(tmp_path / 'm4_best.safetensors')[0].use_legacy_polygons is False


def test_arrow_mixed_status_warning(resources, tmp_path, arrow_pair, caplog):
    """A training set mixing legacy- and new-compiled arrows warns and
    falls back to the new extractor flag."""
    import logging

    from kraken_tpu.models import load_models

    with caplog.at_level(logging.INFO):
        result = _train_on_arrow(tmp_path, 'm5',
                                 [arrow_pair[False], arrow_pair[True]])
    assert result.exit_code == 0, result.output
    warnings_ = [r.message for r in caplog.records if r.levelno >= logging.WARNING]
    assert any('mixes legacy and new polygon' in m for m in warnings_)
    assert load_models(tmp_path / 'm5_best.safetensors')[0].use_legacy_polygons is False
