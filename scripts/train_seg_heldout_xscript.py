#!/usr/bin/env python
"""
Trains the CROSS-SCRIPT held-out segmentation fixture (round-5 item:
two cross-script held-out detection floors with precision >= 0.85).

Both fixture pages — the annotated Latin-script page
(170025120000003,0074) and the Arabic page (arabic.webp, ground truth =
the reference-pinned segmentation in arabic_seg.pkl) — are split at the
widest inter-line gap nearest their vertical midpoint; ONE BLLA model is
trained on the two TOP halves (cross-script mix + augmentation) and
detection quality is measured on the two disjoint BOTTOM halves. The
page-disjoint, script-disjoint mix is what lifts held-out precision over
the single-page fixture (blla_heldout_top: P=0.708 on its held-out half —
a 26-line single-script training set over-predicts on anything unseen).
Reference protocol: held-out validation in kraken/train/blla.py:321-348.

Usage: python scripts/train_seg_heldout_xscript.py [epochs] [--retrain]
Writes tests/resources/blla_heldout_xscript.safetensors and prints the
two bottom-half metric tables recorded in docs/SEG_PARITY.md.
"""
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent))

from train_seg_heldout import (SPEC, find_split_y, pad_to_height,  # noqa: E402
                               split_page, write_training_page)

REPO = pathlib.Path(__file__).parent.parent
RES = REPO / 'tests/resources'
OUT = RES / 'blla_heldout_xscript.safetensors'


def _load_pages():
    """Returns [(name, image, gt Segmentation)] for both fixture pages."""
    import pickle
    from PIL import Image
    from kraken_tpu.xml import XMLPage

    latin_im = Image.open(RES / '170025120000003,0074.jpg')
    latin_im.load()
    latin_gt = XMLPage(RES / '170025120000003,0074.xml').to_container()

    arabic_im = Image.open(RES / 'arabic.webp')
    arabic_im.load()
    sys.path.insert(0, str(REPO / 'tests'))
    from test_serialization import load_ref_pickle
    arabic_gt = load_ref_pickle(RES / 'arabic_seg.pkl')
    return [('latin', latin_im, latin_gt), ('arabic', arabic_im, arabic_gt)]


def prepare(tmp: pathlib.Path):
    """Splits both pages; returns (train_xmls, eval_halves) where
    eval_halves is [(name, bottom_im, bottom_seg, top_height)]."""
    import dataclasses

    def _strip_dangling_region_refs(seg):
        """Half-page crops can drop a region whose lines survived (and the
        Arabic pickle carries a Transkribus 'eSc_dummyblock_' ref with no
        region entry at all) — strip line→region refs that do not resolve
        so PageXML serialization of the training halves stays well-formed."""
        known = {reg.id for regs in (seg.regions or {}).values() for reg in regs}
        return dataclasses.replace(seg, lines=[
            dataclasses.replace(l, regions=[r for r in (l.regions or [])
                                            if r in known])
            for l in seg.lines])

    train_xmls, eval_halves = [], []
    for name, im, gt in _load_pages():
        split_y = find_split_y(gt, im.height)
        (top_im, top_seg), (bot_im, bot_seg) = split_page(im, gt, split_y)
        top_seg = _strip_dangling_region_refs(top_seg)
        print(f'{name}: split_y={split_y}, top {len(top_seg.lines)} / '
              f'bottom {len(bot_seg.lines)} lines')
        train_xmls.append(write_training_page(top_im, top_seg, tmp,
                                              f'{name}_top'))
        eval_halves.append((name, bot_im, bot_seg, top_im.height))
    return train_xmls, eval_halves


def train(train_xmls, epochs: int = 600):
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
    dc = SegmentationTrainingDataConfig(training_data=train_xmls,
                                        evaluation_data=train_xmls,
                                        batch_size=1, augment=True)
    module = SegmentationModel(config)
    trainer = KrakenTrainer(config)
    trainer.fit(module, SegmentationDataModule(dc))
    convert_checkpoint(trainer._ckpt_path('best'), OUT)
    print(f'wrote {OUT}')


def evaluate(eval_halves):
    import warnings
    import numpy as np
    from kraken_tpu import blla
    from kraken_tpu.lib.segmentation_metrics import (compute_detection_metrics,
                                                     interpolate_polyline)
    from kraken_tpu.models import load_models

    model = load_models(OUT)[0]
    results = {}
    for name, bot_im, bot_seg, top_h in eval_halves:
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            pred = blla.segment(pad_to_height(bot_im, top_h), model=model)
        pred_pl = [interpolate_polyline(np.array(l.baseline, float))
                   for l in pred.lines]
        gt_pl = [interpolate_polyline(np.array(l.baseline, float))
                 for l in bot_seg.lines]
        det = compute_detection_metrics(pred_pl, gt_pl, tol=25.0)
        print(f'{name} held-out bottom: pred={len(pred.lines)} '
              f'gt={len(bot_seg.lines)} P={det["precision"]:.4f} '
              f'R={det["recall"]:.4f} F1={det["f1"]:.4f} (tol=25px)')
        results[name] = det
    return results


if __name__ == '__main__':
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 600
    tmp = pathlib.Path(tempfile.mkdtemp())
    train_xmls, eval_halves = prepare(tmp)
    if not OUT.exists() or '--retrain' in sys.argv:
        train(train_xmls, epochs)
    evaluate(eval_halves)
