"""
End-to-end segmentation quality tests against XML ground truth
(BASELINE.md measurement plan step 2; methodology of the reference's
validation-time vectorization, kraken/train/blla.py:321-348), in three
tiers:

1. STACK REGRESSION (same-page): the frozen blla_small model is trained on
   the very page it is evaluated on, so its floors verify that the heatmap
   → vectorize → polygonize → reading-order stack recovers what the net
   learned — NOT that the model generalizes.
2. HELD-OUT generalization: blla_heldout_top is trained on the top half of
   the annotated page only (scripts/train_seg_heldout.py) and its floors
   are asserted on the disjoint bottom-half lines.
3. PERTURBATION robustness: the same-page model re-evaluated on scaled and
   rotated variants of its page, with GT transformed identically.

Metrics and measured values in docs/SEG_PARITY.md.
"""
import math
import warnings

import numpy as np
import pytest
from PIL import Image

PAGE = '170025120000003,0074'


def _detection(pred_seg, gt_polylines, tol=25.0):
    from kraken_tpu.lib.segmentation_metrics import (compute_detection_metrics,
                                                     interpolate_polyline)
    pred_pl = [interpolate_polyline(np.array(l.baseline, float))
               for l in pred_seg.lines]
    return compute_detection_metrics(pred_pl, gt_polylines, tol=tol)


def _gt_polylines(seg, transform=lambda p: p):
    from kraken_tpu.lib.segmentation_metrics import interpolate_polyline
    return [interpolate_polyline(np.array([transform(p) for p in l.baseline],
                                          float))
            for l in seg.lines]


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


def test_baseline_detection_floor_stack_regression(gt_seg, pred_seg):
    """SAME-PAGE floor: blla_small is trained on this page, so this is a
    stack regression (does vectorize/polygonize recover what the net
    learned), not generalization evidence — see the held-out test below."""
    det = _detection(pred_seg, _gt_polylines(gt_seg))
    # floors raised after duplicate-baseline pruning (round 3): measured
    # F1 0.966 / P 0.955 / R 0.977 host fp32 (was F1 0.912 with 8 duplicate
    # lines among 52 predictions vs 44 GT)
    assert det['f1'] >= 0.93, det
    assert det['precision'] >= 0.90, det
    assert det['recall'] >= 0.95, det


def test_heldout_detection_floor(resources):
    """GENERALIZATION floor: blla_heldout_top never saw the bottom-half
    lines it is evaluated on (same page distribution, disjoint lines —
    the reference's held-out-validation protocol,
    kraken/train/blla.py:321-348). Measured on creation: see
    docs/SEG_PARITY.md."""
    import pathlib
    import sys
    from kraken_tpu import blla
    from kraken_tpu.models import load_models
    from kraken_tpu.xml import XMLPage
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / 'scripts'))
    from train_seg_heldout import find_split_y, pad_to_height, split_page

    model_path = resources / 'blla_heldout_top.safetensors'
    if not model_path.exists():
        pytest.skip('held-out fixture model not trained yet')
    im = Image.open(resources / f'{PAGE}.jpg')
    im.load()
    gt = XMLPage(resources / f'{PAGE}.xml').to_container()
    split_y = find_split_y(gt, im.height)
    (top_im, _), (bot_im, bot_seg) = split_page(im, gt, split_y)
    model = load_models(model_path)[0]
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        # pad_to_height removes the protocol's own 24% text-scale shift
        # between the unequal-height crops (see its docstring); the
        # evaluated lines remain unseen by the model
        pred = blla.segment(pad_to_height(bot_im, top_im.height), model=model)
    det = _detection(pred, _gt_polylines(bot_seg))
    # measured on creation: P=0.708 R=0.983 F1=0.823 (augmented training,
    # 600 epochs on the 26 top-half lines; docs/SEG_PARITY.md)
    assert det['f1'] >= 0.75, det
    assert det['recall'] >= 0.90, det


def test_heldout_xscript_detection_floors(resources):
    """TWO CROSS-SCRIPT generalization floors: blla_heldout_xscript is
    trained on the top halves of the Latin-script annotated page AND the
    Arabic fixture page (scripts/train_seg_heldout_xscript.py); detection
    is asserted on both disjoint bottom halves — page-disjoint lines in
    two scripts, the reference's held-out-validation protocol
    (kraken/train/blla.py:321-348). The cross-script training mix is what
    lifts held-out precision over the 600-epoch single-mix baseline
    (P 0.63/0.59 → 0.735/0.778 at 1600 epochs; measured table and the
    remaining-FP fragmentation analysis in docs/SEG_PARITY.md)."""
    import pathlib
    import sys
    from kraken_tpu import blla
    from kraken_tpu.models import load_models
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / 'scripts'))
    from train_seg_heldout import pad_to_height
    from train_seg_heldout_xscript import prepare

    model_path = resources / 'blla_heldout_xscript.safetensors'
    if not model_path.exists():
        pytest.skip('cross-script held-out fixture model not trained yet')
    import tempfile
    _, eval_halves = prepare(pathlib.Path(tempfile.mkdtemp()))
    model = load_models(model_path)[0]
    for name, bot_im, bot_seg, top_h in eval_halves:
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            pred = blla.segment(pad_to_height(bot_im, top_h), model=model)
        det = _detection(pred, _gt_polylines(bot_seg))
        # measured on creation: latin P=0.735 R=0.980, arabic P=0.778
        # R=0.990 (docs/SEG_PARITY.md round-5 table); floors leave slack
        # for platform/precision variation
        assert det['precision'] >= 0.70, (name, det)
        assert det['recall'] >= 0.90, (name, det)
        assert det['f1'] >= 0.80, (name, det)


def test_perturbation_scale_floor(resources, gt_seg):
    """The same-page model on 0.9x/1.1x rescaled pages (GT scaled
    identically): detection must stay near the unperturbed floor.
    Measured on creation: F1 0.962 (0.9x), 0.955 (1.1x)."""
    from kraken_tpu import blla
    from kraken_tpu.models import load_models
    im = Image.open(resources / f'{PAGE}.jpg')
    im.load()
    model = load_models(resources / 'blla_small.safetensors')[0]
    for s in (0.9, 1.1):
        sc = im.resize((round(im.width * s), round(im.height * s)),
                       Image.LANCZOS)
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            pred = blla.segment(sc, model=model)
        det = _detection(pred, _gt_polylines(gt_seg,
                                             lambda p: (p[0] * s, p[1] * s)))
        assert det['f1'] >= 0.90, (s, det)


def test_perturbation_rotation_recall(resources, gt_seg):
    """±2° rotation: the no-augmentation overfit fixture model fragments
    its heatmaps off-orientation (~4x spurious baselines, measured
    P≈0.14), which is a property of its single-page training, not of the
    inference stack — so this test pins what the stack still guarantees:
    most true lines remain recovered among the noise (measured R 0.642 /
    0.620 at ±2°). Rotation-robust *models* come from training-time
    augmentation (dataset/segmentation.py SegmentationAugmenter), like the
    reference's."""
    from kraken_tpu import blla
    from kraken_tpu.models import load_models
    im = Image.open(resources / f'{PAGE}.jpg')
    im.load()
    model = load_models(resources / 'blla_small.safetensors')[0]
    for angle in (2, -2):
        rot = im.rotate(angle, resample=Image.BILINEAR, expand=True,
                        fillcolor='white')
        a = math.radians(angle)
        cos, sin = math.cos(a), math.sin(a)
        cx, cy = im.width / 2, im.height / 2

        def fwd(p, cos=cos, sin=sin, rw=rot.width, rh=rot.height):
            return ((p[0] - cx) * cos + (p[1] - cy) * sin + rw / 2,
                    -(p[0] - cx) * sin + (p[1] - cy) * cos + rh / 2)

        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            pred = blla.segment(rot, model=model)
        det = _detection(pred, _gt_polylines(gt_seg, fwd))
        assert det['recall'] >= 0.55, (angle, det)


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


def test_packbits_transfer_matches_float(resources, pred_seg):
    """heatmap_precision='packbits' (device-thresholded, bit-packed masks —
    the low-bandwidth transfer policy) must reproduce the float32 pipeline's
    segmentation: identical inputs to every host decision (region >0.5,
    separator-orientation sign tests, ridge threshold) are computed on
    device from the same full-precision sigmoid, so baselines match the
    float path exactly on one platform while the transfer shrinks ~35x."""
    from kraken_tpu.configs import SegmentationInferenceConfig
    from kraken_tpu.inference.segmentation import (prepare_segmentation,
                                                   segmentation_pred)
    from kraken_tpu.lib import telemetry
    from kraken_tpu.models import load_models
    im = Image.open(resources / f'{PAGE}.jpg')
    model = load_models(resources / 'blla_small.safetensors')[0]
    prepare_segmentation(model, SegmentationInferenceConfig(
        precision='32-true', heatmap_precision='packbits'))
    assert model._seg_transfer == 'packbits'
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        with telemetry.collect() as xfer:
            seg = segmentation_pred(model, im)
    assert [l.baseline for l in seg.lines] == \
        [l.baseline for l in pred_seg.lines]
    assert {k: [r.boundary for r in v] for k, v in seg.regions.items()} == \
        {k: [r.boundary for r in v] for k, v in pred_seg.regions.items()}
    # the packed download must stay under a tenth of the uint8 heatmaps
    # (fixture page: ~230 kB vs ~2 MB uint8 / ~8 MB float32+ridges)
    assert 0 < xfer.down_bytes < 400_000, xfer.down_bytes


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


def test_arabic_repolygonization_matches_reference_boundaries(resources):
    """Cross-implementation polygonization probe on an RTL page: strip the
    reference-computed boundaries from the pickled 24-line Arabic
    segmentation (produced by upstream kraken's own polygonizer) and
    re-derive them from the bare baselines with our
    calculate_polygonal_environment. Per-line rasterized IoU against the
    reference boundaries must stay high — this measures geometry parity on
    a script/layout family the Latin/Greek fixture pages don't cover
    (reference methodology: kraken/lib/segmentation.py:747)."""
    import cv2
    from kraken_tpu.lib.polygonization import calculate_polygonal_environment
    from tests.test_serialization import load_ref_pickle

    seg = load_ref_pickle(resources / 'arabic_seg.pkl')
    im = Image.open(resources / 'arabic.webp')
    baselines = [np.array(line.baseline) for line in seg.lines]
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        ours = calculate_polygonal_environment(im, baselines)
    assert len(ours) == len(seg.lines) == 24
    ious = []
    for pol, line in zip(ours, seg.lines):
        assert pol is not None, f'polygonization failed for line {line.id}'
        a = np.zeros((im.height, im.width), np.uint8)
        b = np.zeros((im.height, im.width), np.uint8)
        cv2.fillPoly(a, [np.asarray(pol, np.int32).reshape(-1, 1, 2)], 1)
        cv2.fillPoly(b, [np.asarray(line.boundary, np.int32).reshape(-1, 1, 2)], 1)
        inter = np.logical_and(a, b).sum()
        union = np.logical_or(a, b).sum()
        ious.append(inter / union if union else 0.0)
    ious = np.array(ious)
    # measured: mean/median 0.846, min 0.810 (seam-tie and ROI-raster
    # differences between the implementations bound agreement below 1.0);
    # floors leave regression headroom below the measured values
    assert ious.mean() >= 0.82, ious.round(3).tolist()
    assert np.median(ious) >= 0.82, ious.round(3).tolist()
    assert (ious >= 0.75).all(), ious.round(3).tolist()
