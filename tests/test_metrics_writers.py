"""
Tests for baseline-detection metrics and the CoreML writer roundtrip.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from kraken_tpu.lib.segmentation_metrics import (aggregate_detection_metrics,
                                                 baseline_score,
                                                 compute_detection_metrics,
                                                 interpolate_polyline)
from kraken_tpu.models import load_models, write_models


def test_interpolate_polyline():
    line = np.array([[0, 0], [100, 0]], float)
    pts = interpolate_polyline(line, spacing=5.0)
    assert len(pts) == 20
    np.testing.assert_allclose(np.diff(pts[:, 0]).mean(), 100 / 19, atol=0.1)


def test_baseline_score_identical():
    line = interpolate_polyline(np.array([[0, 0], [100, 0]], float))
    assert baseline_score(line, line, tol=5.0) == 1.0


def test_baseline_score_offset():
    a = interpolate_polyline(np.array([[0, 0], [100, 0]], float))
    b = interpolate_polyline(np.array([[0, 30], [100, 30]], float))
    # 30px offset with tol 5: beyond 3*tol -> score 0
    assert baseline_score(a, b, tol=5.0) == 0.0
    # offset within falloff region
    c = interpolate_polyline(np.array([[0, 10], [100, 10]], float))
    assert 0 < baseline_score(a, c, tol=5.0) < 1


def test_detection_metrics_perfect():
    lines = [interpolate_polyline(np.array([[0, y], [100, y]], float))
             for y in (0, 50, 100)]
    m = compute_detection_metrics(lines, lines, tol=5.0)
    assert m['precision'] == pytest.approx(1.0)
    assert m['recall'] == pytest.approx(1.0)
    assert m['f1'] == pytest.approx(1.0)


def test_detection_metrics_missing():
    gt = [interpolate_polyline(np.array([[0, y], [100, y]], float))
          for y in (0, 50)]
    pred = gt[:1]
    m = compute_detection_metrics(pred, gt, tol=5.0)
    assert m['precision'] == pytest.approx(1.0)
    assert m['recall'] == pytest.approx(0.5)


def test_detection_metrics_empty():
    assert compute_detection_metrics([], [], 5.0)['f1'] == 1.0
    assert compute_detection_metrics([], [np.zeros((2, 2))], 5.0)['f1'] == 0.0


def test_aggregate():
    agg = aggregate_detection_metrics([{'precision': 1.0, 'recall': 0.5, 'f1': 2 / 3},
                                       {'precision': 0.5, 'recall': 1.0, 'f1': 2 / 3}])
    assert agg['precision'] == pytest.approx(0.75)


@pytest.mark.parametrize('src', ['overfit.mlmodel',
                                 'merge_tests/merge_codec_nfd.mlmodel'])
def test_coreml_writer_roundtrip(resources, tmp_path, src):
    model = load_models(resources / src)[0]
    out = tmp_path / 'roundtrip.mlmodel'
    write_models([model], out, format='coreml')
    reloaded = load_models(out)[0]
    assert reloaded.codec.c2l == model.codec.c2l
    sd1, sd2 = model.state_dict(), reloaded.state_dict()
    assert set(sd1) == set(sd2)
    for k in sd1:
        np.testing.assert_allclose(sd1[k], sd2[k], atol=1e-6, err_msg=k)
    x = np.random.RandomState(0).rand(1, 1, model.input[2] or 48, 64).astype(np.float32)
    y1, _ = model.forward(jnp.asarray(x), jnp.array([64]))
    y2, _ = reloaded.forward(jnp.asarray(x), jnp.array([64]))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_coreml_writer_with_ro(resources, tmp_path):
    from kraken_tpu.ro.layers import ROMLP
    model = load_models(resources / 'overfit.mlmodel')[0]
    model.user_metadata['class_mapping'] = {'baselines': {'default': 2}, 'regions': {},
                                            'aux': {'_start_separator': 0,
                                                    '_end_separator': 1}}
    # class mapping must match the segmentation model's baseline mapping
    # (the loader reconstructs the ROMLP from it)
    romlp = ROMLP(class_mapping={'default': 2}, level='baselines')
    out = tmp_path / 'combined.mlmodel'
    write_models([model, romlp], out, format='coreml')
    models = load_models(out)
    assert len(models) == 2
    ro = [m for m in models if 'reading_order' in m.model_type][0]
    np.testing.assert_allclose(np.asarray(ro.params['fc1.weight']),
                               np.asarray(romlp.params['fc1.weight']), atol=1e-6)


def test_coreml_writer_segmentation_model(tmp_path):
    """Segmentation models (GroupNorm + heatmap output + class mapping)
    round-trip through the CoreML writer bit-exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from kraken_tpu.models import load_models, write_models
    from kraken_tpu.vgsl import VGSLModel

    model = VGSLModel(vgsl='[1,128,0,3 Cr3,3,8,2,2 Gn2 Cr3,3,16,2,2 Gn2 O2l4]',
                      rng=jax.random.PRNGKey(0))
    model.model_type = 'segmentation'
    cm = {'aux': {'_start_separator': 0, '_end_separator': 1},
          'baselines': {'default': 2}, 'regions': {'text': 3}}
    model.user_metadata['class_mapping'] = cm
    write_models([model], tmp_path / 'seg.mlmodel', format='coreml')
    m2 = load_models(tmp_path / 'seg.mlmodel')[0]
    x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 128, 160), jnp.float32)
    a, _ = model.net.apply(model.params, x, None)
    b, _ = m2.net.apply(m2.params, x, None)
    assert float(jnp.abs(a - b).max()) == 0.0
    assert m2.user_metadata['class_mapping'] == cm
