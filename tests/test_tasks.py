"""
Task API tests (reference: tests/test_tasks.py): recognition/segmentation/
forced-alignment wrappers over model collections.
"""
import warnings

import pytest
from PIL import Image

from kraken_tpu.configs import RecognitionInferenceConfig, SegmentationInferenceConfig
from kraken_tpu.containers import BaselineLine, BBoxLine, Segmentation
from kraken_tpu.models import load_models
from kraken_tpu.tasks import (ForcedAlignmentTaskModel, RecognitionTaskModel,
                              SegmentationTaskModel)

BBOX_GOLD = 'ܡ ܘܡ ܗ ܡܕܐ ܐ ܐܐ ܡ ܗܗܐܐܐܕ'


@pytest.fixture(scope='module', autouse=True)
def quiet():
    warnings.filterwarnings('ignore')


@pytest.fixture(scope='module')
def overfit_line(resources):
    return Image.open(resources / '000236.png')


def test_recognition_task(resources, overfit_line):
    task = RecognitionTaskModel.load_model(resources / 'overfit.mlmodel')
    assert task.seg_type == 'bbox'
    seg = Segmentation(type='bbox', imagename='x', text_direction='horizontal-lr',
                       script_detection=False,
                       lines=[BBoxLine(id='foo', bbox=[0, 0, 2544, 156])])
    records = list(task.predict(overfit_line, seg,
                                RecognitionInferenceConfig(padding=1, num_line_workers=0)))
    assert records[0].prediction == BBOX_GOLD


def test_recognition_task_rejects_seg_models(resources):
    import jax
    from kraken_tpu.vgsl import VGSLModel
    model = VGSLModel(vgsl='[1,48,0,1 Cr3,3,2 O2l2]', rng=jax.random.PRNGKey(0))
    model.model_type = 'segmentation'
    with pytest.raises(ValueError):
        RecognitionTaskModel([model])


def test_segmentation_task_smoke():
    import jax
    import numpy as np
    from kraken_tpu.vgsl import VGSLModel
    model = VGSLModel(vgsl='[1,128,0,3 Cr3,3,8,2,2 Gn2 O2l4]', rng=jax.random.PRNGKey(0))
    model.model_type = 'segmentation'
    model.user_metadata['class_mapping'] = {'aux': {'_start_separator': 0,
                                                    '_end_separator': 1},
                                            'baselines': {'default': 2},
                                            'regions': {'text': 3}}
    task = SegmentationTaskModel([model])
    im = Image.fromarray(np.random.RandomState(1).randint(0, 255, (160, 200, 3), np.uint8))
    seg = task.predict(im, SegmentationInferenceConfig())
    assert seg.type == 'baselines'


def test_forced_alignment(resources, overfit_line):
    task = ForcedAlignmentTaskModel.load_model(resources / 'overfit.mlmodel')
    seg = Segmentation(type='baselines', imagename='x', text_direction='horizontal-lr',
                       script_detection=False,
                       lines=[BaselineLine(id='foo',
                                           text=BBOX_GOLD,
                                           baseline=[[0, 10], [2543, 10]],
                                           boundary=[[0, 0], [2543, 0], [2543, 155], [0, 155]])])
    aligned = task.predict(overfit_line, seg, RecognitionInferenceConfig(padding=1, num_line_workers=0))
    rec = aligned.lines[0]
    assert len(rec.prediction) > 0
    # aligned prediction contains only characters of the transcription
    assert set(rec.prediction) <= set(BBOX_GOLD)
    assert len(rec.cuts) == len(rec.prediction)
    # cut positions are monotonically reasonable and within the line
    assert all(0 <= c[0][0] <= 2544 for c in rec.cuts)


def test_align_trellis_basic():
    """Alignment of a known simple emission sequence."""
    import numpy as np
    from kraken_tpu.align import get_trellis, backtrack, merge_repeats
    # 6 frames, 3 classes (blank, a, b); clear a-then-b emission
    probs = np.array([[0.1, 0.8, 0.1], [0.1, 0.8, 0.1], [0.8, 0.1, 0.1],
                      [0.1, 0.1, 0.8], [0.1, 0.1, 0.8], [0.8, 0.1, 0.1]], np.float32)
    emission = np.log(probs)
    tokens = np.array([1, 2])
    trellis = get_trellis(emission, tokens)
    path = backtrack(trellis, emission, tokens)
    segments = merge_repeats(path, 'ab')
    assert [s.label for s in segments] == ['a', 'b']
    assert segments[0].start < segments[1].start


def test_trellis_device_parity():
    """The lax.scan trellis matches the numpy reference implementation."""
    import numpy as np
    from kraken_tpu.align import get_trellis, get_trellis_device

    rng = np.random.RandomState(0)
    emission = np.log(rng.dirichlet(np.ones(12), size=40).astype(np.float32))
    tokens = np.array([3, 1, 7, 7, 2], np.int32)
    a = get_trellis(emission, tokens)
    b = np.asarray(get_trellis_device(emission, tokens))
    mask = np.isfinite(a) & np.isfinite(b)
    np.testing.assert_allclose(a[mask], b[mask], rtol=1e-6)
    np.testing.assert_array_equal(np.isfinite(a), np.isfinite(b))
