#!/usr/bin/env python
"""
Trains the frozen segmentation parity fixture: a small BLLA model overfit on
the annotated test page (tests/resources/170025120000003,0074.xml), saved to
tests/resources/blla_small.safetensors, then evaluated end-to-end — the full
heatmap → vectorize → polygonize → reading-order stack via blla.segment —
against the XML ground truth with Transkribus-style baseline-detection
metrics and region IU (BASELINE.md measurement plan step 2; reference
methodology: kraken/train/blla.py:321-348 validation vectorization).

Usage: python scripts/train_seg_golden.py [epochs]
Prints the metric table recorded in docs/SEG_PARITY.md.
"""
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

REPO = pathlib.Path(__file__).parent.parent
XML = str(REPO / 'tests/resources/170025120000003,0074.xml')
OUT = REPO / 'tests/resources/blla_small.safetensors'

SPEC = ('[1,512,0,3 Cr3,3,32,2,2 Gn8 Cr3,3,64,2,2 Gn16 Cr3,3,96 Gn16 '
        'Cr3,3,96 Gn16 Cr3,3,64 Gn16]')


def train(epochs: int = 400):
    import numpy as np
    np.random.seed(42)
    from kraken_tpu.configs import (SegmentationTrainingConfig,
                                    SegmentationTrainingDataConfig)
    from kraken_tpu.train import (KrakenTrainer, SegmentationDataModule,
                                  SegmentationModel, convert_checkpoint)
    tmp = pathlib.Path(tempfile.mkdtemp())
    config = SegmentationTrainingConfig(
        spec=SPEC, epochs=epochs, lrate=2e-3, freq=100, schedule='cosine',
        cos_t_max=epochs,
        checkpoint_path=str(tmp / 'seg'))
    dc = SegmentationTrainingDataConfig(training_data=[XML],
                                        evaluation_data=[XML], batch_size=1)
    module = SegmentationModel(config)
    trainer = KrakenTrainer(config)
    trainer.fit(module, SegmentationDataModule(dc))
    for epoch, metrics in module.net.user_metadata['metrics']:
        print('epoch', epoch, {k: round(float(v), 4) for k, v in metrics.items()
                               if isinstance(v, (int, float))})
    best = trainer._ckpt_path('best')
    convert_checkpoint(best, OUT)
    print(f'wrote {OUT}')


def evaluate():
    import numpy as np
    from PIL import Image
    from kraken_tpu import blla
    from kraken_tpu.lib.segmentation_metrics import (compute_detection_metrics,
                                                     interpolate_polyline)
    from kraken_tpu.models import load_models
    from kraken_tpu.xml import XMLPage

    gt = XMLPage(XML).to_container()
    im = Image.open(REPO / 'tests/resources/170025120000003,0074.jpg')
    model = load_models(OUT)[0]
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        pred = blla.segment(im, model=model)

    pred_pl = [interpolate_polyline(np.array(l.baseline, float)) for l in pred.lines]
    gt_pl = [interpolate_polyline(np.array(l.baseline, float)) for l in gt.lines]
    det = compute_detection_metrics(pred_pl, gt_pl, tol=25.0)

    # region IU: rasterized union of predicted vs GT text regions
    from kraken_tpu.lib.geometry import make_polygonal_mask
    shape = (im.height, im.width)
    def region_mask(seg):
        m = np.zeros(shape, bool)
        for regs in seg.regions.values():
            for r in regs:
                if r.boundary:
                    mask = make_polygonal_mask(np.array(r.boundary), (im.width, im.height))
                    m |= np.asarray(mask) > 0
        return m
    pm, gm = region_mask(pred), region_mask(gt)
    inter, union = (pm & gm).sum(), (pm | gm).sum()
    region_iu = inter / union if union else 0.0

    print(f'baselines: pred={len(pred.lines)} gt={len(gt.lines)}')
    print(f"baseline detection P={det['precision']:.4f} R={det['recall']:.4f} "
          f"F1={det['f1']:.4f} (tol=25px)")
    print(f'region IU={region_iu:.4f}')
    return det, region_iu


if __name__ == '__main__':
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    if not OUT.exists() or '--retrain' in sys.argv or epochs != 400:
        train(epochs)
    evaluate()
