#!/usr/bin/env python
"""
Trains the HELD-OUT segmentation fixture: the annotated test page is split
at the widest inter-line gap nearest its vertical midpoint, a small BLLA
model is trained on the TOP half only, and detection quality is measured on
the BOTTOM half — disjoint lines from the same distribution, the same
protocol the reference applies by validating on held-out pages
(kraken/train/blla.py:321-348). This is the generalization evidence the
same-page parity fixture (scripts/train_seg_golden.py, a *stack
regression*) cannot provide.

Usage: python scripts/train_seg_heldout.py [epochs]
Writes tests/resources/blla_heldout_top.safetensors and prints the
bottom-half metric table recorded in docs/SEG_PARITY.md.
"""
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

REPO = pathlib.Path(__file__).parent.parent
XML = str(REPO / 'tests/resources/170025120000003,0074.xml')
JPG = str(REPO / 'tests/resources/170025120000003,0074.jpg')
OUT = REPO / 'tests/resources/blla_heldout_top.safetensors'

SPEC = ('[1,512,0,3 Cr3,3,32,2,2 Gn8 Cr3,3,64,2,2 Gn16 Cr3,3,96 Gn16 '
        'Cr3,3,96 Gn16 Cr3,3,64 Gn16]')


def find_split_y(container, height: int) -> int:
    """The y of the widest horizontal gap between line bounding boxes
    nearest the page's vertical midpoint — a split there puts every line
    wholly into one half."""
    import numpy as np
    spans = []
    for line in container.lines:
        pts = list(line.baseline) + list(line.boundary or [])
        ys = [p[1] for p in pts]
        spans.append((min(ys), max(ys)))
    spans.sort()
    gaps = []
    for (_, top_max), (bot_min, _) in zip(spans, spans[1:]):
        if bot_min > top_max:
            gaps.append(((top_max + bot_min) // 2, bot_min - top_max))
    if not gaps:
        return height // 2
    mid = height / 2
    # widest gap, penalized by distance from the midpoint
    return max(gaps, key=lambda g: g[1] - abs(g[0] - mid) * 0.5)[0]


def _clip_polygon_y(poly, y0: int, y1: int):
    """Clamps polygon y coordinates to [y0, y1] and shifts by -y0."""
    out = [(int(x), int(min(max(y, y0), y1)) - y0) for x, y in poly]
    return out if len({tuple(p) for p in out}) >= 3 else None


def split_page(im, container, split_y: int):
    """Splits a page image + Segmentation into (top_im, top_seg),
    (bottom_im, bottom_seg) at split_y; lines are assigned wholly by their
    extent, region polygons are y-clipped to their half."""
    import dataclasses
    from kraken_tpu.containers import Region, Segmentation

    halves = []
    for y0, y1 in ((0, split_y), (split_y, im.height)):
        crop = im.crop((0, y0, im.width, y1))
        lines = []
        for line in container.lines:
            ys = [p[1] for p in list(line.baseline) + list(line.boundary or [])]
            if min(ys) >= y0 and max(ys) <= y1:
                lines.append(dataclasses.replace(
                    line,
                    baseline=[(int(x), int(y) - y0) for x, y in line.baseline],
                    boundary=[(int(x), int(y) - y0) for x, y in line.boundary]
                    if line.boundary else line.boundary))
        regions = {}
        for cls, regs in (container.regions or {}).items():
            kept = []
            for reg in regs:
                if not reg.boundary:
                    continue
                ys = [p[1] for p in reg.boundary]
                if max(ys) <= y0 or min(ys) >= y1:
                    continue
                clipped = _clip_polygon_y(reg.boundary, y0, y1)
                if clipped:
                    kept.append(Region(id=reg.id, boundary=clipped,
                                       tags=reg.tags))
            if kept:
                regions[cls] = kept
        halves.append((crop, Segmentation(
            text_direction=container.text_direction, imagename=None,
            type='baselines', lines=lines, regions=regions,
            script_detection=False, line_orders=[])))
    return halves


def write_training_page(im, seg, out_dir: pathlib.Path, stem: str) -> str:
    """Writes the crop image + a PageXML ground-truth file next to it and
    returns the XML path (the shape XMLPage/BaselineSet consume)."""
    import dataclasses
    from kraken_tpu.serialization import serialize
    img_path = out_dir / f'{stem}.png'
    im.save(img_path)
    seg = dataclasses.replace(seg, imagename=str(img_path))
    xml = serialize(seg, image_size=im.size, template='pagexml')
    xml_path = out_dir / f'{stem}.xml'
    xml_path.write_text(xml)
    return str(xml_path)


def prepare_halves(tmp: pathlib.Path):
    from PIL import Image
    from kraken_tpu.xml import XMLPage
    im = Image.open(JPG)
    im.load()
    gt = XMLPage(XML).to_container()
    split_y = find_split_y(gt, im.height)
    (top_im, top_seg), (bot_im, bot_seg) = split_page(im, gt, split_y)
    top_xml = write_training_page(top_im, top_seg, tmp, 'top')
    return split_y, top_xml, (top_im, top_seg), (bot_im, bot_seg)


def train(top_xml: str, epochs: int = 400):
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
    # augmentation is what makes the half-page model generalize: the two
    # crops render text at different network-space scales (both halves are
    # resized to the spec's 512-px input height from different crop
    # heights), and the augmenter's scale/affine warps cover that gap.
    # Without it the overfit net emits ~4x spurious baselines on the
    # held-out half (measured P=0.18 at R=0.86).
    dc = SegmentationTrainingDataConfig(training_data=[top_xml],
                                        evaluation_data=[top_xml],
                                        batch_size=1, augment=True)
    module = SegmentationModel(config)
    trainer = KrakenTrainer(config)
    trainer.fit(module, SegmentationDataModule(dc))
    best = trainer._ckpt_path('best')
    convert_checkpoint(best, OUT)
    print(f'wrote {OUT}')


def pad_to_height(im, height: int):
    """White-pads a crop to `height`: the network rescales every page to
    its fixed input height, so equal crop heights render the two halves'
    text at the SAME network-space scale. Without this the protocol
    itself injects a 24% text-scale shift (2254 vs 1711 px crops) that a
    whole-page user never sees — measured F1 0.39 unpadded vs 0.82 padded
    with the identical model; scale robustness proper is covered by the
    perturbation tests."""
    from PIL import Image
    if im.height >= height:
        return im
    pad = Image.new(im.mode, (im.width, height), 'white')
    pad.paste(im, (0, 0))
    return pad


def evaluate(bot_im, bot_seg, train_height: int):
    import warnings
    import numpy as np
    from kraken_tpu import blla
    from kraken_tpu.lib.segmentation_metrics import (compute_detection_metrics,
                                                     interpolate_polyline)
    from kraken_tpu.models import load_models

    model = load_models(OUT)[0]
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        pred = blla.segment(pad_to_height(bot_im, train_height), model=model)
    pred_pl = [interpolate_polyline(np.array(l.baseline, float))
               for l in pred.lines]
    gt_pl = [interpolate_polyline(np.array(l.baseline, float))
             for l in bot_seg.lines]
    det = compute_detection_metrics(pred_pl, gt_pl, tol=25.0)
    print(f'held-out bottom half: pred={len(pred.lines)} gt={len(bot_seg.lines)}')
    print(f"baseline detection P={det['precision']:.4f} R={det['recall']:.4f} "
          f"F1={det['f1']:.4f} (tol=25px)")
    return det


if __name__ == '__main__':
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    tmp = pathlib.Path(tempfile.mkdtemp())
    split_y, top_xml, (top_im, top_seg), (bot_im, bot_seg) = prepare_halves(tmp)
    print(f'split_y={split_y}: top {len(top_seg.lines)} lines, '
          f'bottom {len(bot_seg.lines)} lines')
    if not OUT.exists() or '--retrain' in sys.argv:
        train(top_xml, epochs)
    evaluate(bot_im, bot_seg, train_height=top_im.height)
