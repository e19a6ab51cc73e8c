"""
End-to-end segmentation quality regression against XML ground truth
(BASELINE.md measurement plan step 2; methodology of the reference's
validation-time vectorization, kraken/train/blla.py:321-348). The frozen
blla_small model (scripts/train_seg_golden.py) drives the full heatmap →
vectorize → polygonize → reading-order stack; metrics in docs/SEG_PARITY.md.
"""
import warnings

import numpy as np
import pytest
from PIL import Image

PAGE = '170025120000003,0074'


@pytest.fixture(scope='module')
def gt_seg(resources):
    from kraken_tpu.xml import XMLPage
    return XMLPage(resources / f'{PAGE}.xml').to_container()


@pytest.fixture(scope='module')
def pred_seg(resources):
    from kraken_tpu import blla
    from kraken_tpu.models import load_models
    model = load_models(resources / 'blla_small.safetensors')[0]
    im = Image.open(resources / f'{PAGE}.jpg')
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        return blla.segment(im, model=model)


def test_baseline_detection_floor(gt_seg, pred_seg):
    from kraken_tpu.lib.segmentation_metrics import (compute_detection_metrics,
                                                     interpolate_polyline)
    pred_pl = [interpolate_polyline(np.array(l.baseline, float)) for l in pred_seg.lines]
    gt_pl = [interpolate_polyline(np.array(l.baseline, float)) for l in gt_seg.lines]
    det = compute_detection_metrics(pred_pl, gt_pl, tol=25.0)
    # floors raised after duplicate-baseline pruning (round 3): measured
    # F1 0.966 / P 0.955 / R 0.977 host fp32 (was F1 0.912 with 8 duplicate
    # lines among 52 predictions vs 44 GT)
    assert det['f1'] >= 0.93, det
    assert det['precision'] >= 0.90, det
    assert det['recall'] >= 0.95, det


def test_region_iu_floor(resources, gt_seg, pred_seg):
    from kraken_tpu.lib.geometry import make_polygonal_mask
    im = Image.open(resources / f'{PAGE}.jpg')

    def region_mask(seg):
        m = np.zeros((im.height, im.width), bool)
        for regs in seg.regions.values():
            for r in regs:
                if r.boundary:
                    mask = make_polygonal_mask(np.array(r.boundary),
                                               (im.width, im.height))
                    m |= np.asarray(mask) > 0
        return m

    pm, gm = region_mask(pred_seg), region_mask(gt_seg)
    union = (pm | gm).sum()
    assert union > 0
    assert (pm & gm).sum() / union >= 0.90


def test_predicted_lines_have_boundaries_and_order(pred_seg, gt_seg):
    assert pred_seg.type == 'baselines'
    # line count within 20% of ground truth
    assert abs(len(pred_seg.lines) - len(gt_seg.lines)) <= 0.2 * len(gt_seg.lines)
    for line in pred_seg.lines:
        assert line.baseline and len(line.baseline) >= 2
        assert line.boundary and len(line.boundary) >= 3
    # reading order is roughly top-to-bottom: mean y of first third of lines
    # is above the last third
    ys = [np.mean([p[1] for p in ln.baseline]) for ln in pred_seg.lines]
    third = max(1, len(ys) // 3)
    assert np.mean(ys[:third]) < np.mean(ys[-third:])
