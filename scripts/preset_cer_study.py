#!/usr/bin/env python
"""
Corpus-scale preset quality study (VERDICT r3 item 4): compiles EVERY
ground-truth line in the repo's fixtures into one arrow corpus with a
random held-out validation split, trains the reference architecture
('default') and the MXU-width 'tpu' preset to convergence on the train
split only, and reports best held-out validation CER side-by-side — the
evidence that the fast preset's speed numbers come at no quality cost,
measured the way the reference reports model quality
(/root/reference/docs/_static/sample_metadata.md: val CER on held-out
data).

Sources (≈95 lines):
- tests/resources/170025120000003,0074.xml — 44 transcribed baselines
- tests/resources/merge_tests/0014.xml — transcribed page
- tests/resources/merge_tests/{0006,0007,0008,0021} + 000236 — path pairs
- tests/resources/bw.png + bw_page_golden.json — 24 legacy-bbox lines

Usage: python scripts/preset_cer_study.py [--epochs N] [--only NAME]
Results recorded in docs/architecture.md.
"""
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

RES = pathlib.Path(__file__).parent.parent / 'tests/resources'

SPECS = {'default': 'default', 'tpu': 'tpu'}
SPLIT = (0.8, 0.2, 0.0)


def _bw_container():
    """The bw.png page as a Segmentation with the pinned golden texts
    attached to its legacy-segmenter bbox lines."""
    import dataclasses
    from PIL import Image
    from kraken_tpu.pageseg import segment
    im = Image.open(RES / 'bw.png')
    im.load()
    seg = segment(im)
    golden = json.loads((RES / 'bw_page_golden.json').read_text())
    lines = [dataclasses.replace(line, text=golden[str(i)])
             for i, line in enumerate(seg.lines) if str(i) in golden]
    seg = dataclasses.replace(seg, lines=lines,
                              imagename=str(RES / 'bw.png'))
    return seg


def build_corpus(out_dir: pathlib.Path) -> list:
    """Compiles the three fixture source families into arrow files with a
    deterministic 80/20 train/val split; returns the file list."""
    import numpy as np
    from kraken_tpu.dataset.arrow import build_binary_dataset

    jobs = [
        ('xml_lines.arrow', dict(
            files=[str(RES / '170025120000003,0074.xml'),
                   str(RES / 'merge_tests/0014.xml')],
            format_type='xml')),
        ('path_lines.arrow', dict(
            files=[str(RES / 'merge_tests' / f'{n}.jpg')
                   for n in ('0006', '0007', '0008', '0021')] +
                  [str(RES / '000236.png')],
            format_type='path',
            # relabel the bbox crops so all three arrows carry one type
            # (the stored line images are already extracted either way)
            force_type='kraken_recognition_baseline')),
        ('bw_lines.arrow', dict(
            files=[_bw_container()],
            format_type=None)),
    ]
    outs = []
    for name, kwargs in jobs:
        np.random.seed(0)  # deterministic split masks
        out = out_dir / name
        build_binary_dataset(output_file=str(out), random_split=SPLIT,
                             **kwargs)
        outs.append(str(out))
    return outs


def train_one(name: str, spec: str, corpus: list, epochs: int,
              load: str = None):
    from kraken_tpu.configs import (RecognitionTrainingConfig,
                                    RecognitionTrainingDataConfig)
    from kraken_tpu.train import (KrakenTrainer, RecognitionDataModule,
                                  RecognitionModel)

    tmp = pathlib.Path(tempfile.mkdtemp())
    config = RecognitionTrainingConfig(
        spec=spec, epochs=epochs, quit='fixed', lrate=1e-3, warmup=100,
        freq=min(25, epochs), batch_size=16,
        checkpoint_path=str(tmp / name))
    dc = RecognitionTrainingDataConfig(
        format_type='binary', binary_dataset_split=True,
        training_data=corpus, evaluation_data=corpus, batch_size=16)
    if load:
        # warm-continue a previous study run's checkpoint (same corpus →
        # codec negotiation is the identity)
        module = RecognitionModel.load_from_weights(config, load)
    else:
        module = RecognitionModel(config)
    t0 = time.perf_counter()
    KrakenTrainer(config).fit(module, RecognitionDataModule(dc))
    wall = time.perf_counter() - t0
    history = module.net.user_metadata['metrics']
    cers = [(ep, 1 - m.get('val_accuracy', 0.0)) for ep, m in history]
    if not cers:
        return {'arch': name, 'best_val_cer': None, 'best_epoch': None,
                'wall_s': round(wall, 1), 'val_cer_tail': []}
    best_ep, best_cer = min(cers, key=lambda x: x[1])
    return {'arch': name,
            'best_val_cer': round(best_cer, 4),
            'best_epoch': best_ep,
            'wall_s': round(wall, 1),
            'val_cer_tail': [(ep, round(c, 4)) for ep, c in cers[-3:]]}


def main():
    epochs = 600
    if '--epochs' in sys.argv:
        epochs = int(sys.argv[sys.argv.index('--epochs') + 1])
    specs = SPECS
    if '--only' in sys.argv:
        pick = sys.argv[sys.argv.index('--only') + 1]
        specs = {pick: SPECS[pick]}
    loads = {}
    for name in SPECS:
        flag = f'--load-{name}'
        if flag in sys.argv:
            loads[name] = sys.argv[sys.argv.index(flag) + 1]
    corpus_dir = pathlib.Path(tempfile.mkdtemp())
    corpus = build_corpus(corpus_dir)
    from kraken_tpu.dataset.recognition import ArrowIPCRecognitionDataset
    tr, va = ArrowIPCRecognitionDataset(split_filter='train'), \
        ArrowIPCRecognitionDataset(split_filter='validation')
    for f in corpus:
        tr.add(file=f)
        va.add(file=f)
    print(f'corpus: {len(tr)} train / {len(va)} held-out val lines',
          flush=True)
    results = []
    for name, spec in specs.items():
        print(f'=== training {name} ({epochs} epochs) ===', flush=True)
        r = train_one(name, spec, corpus, epochs, load=loads.get(name))
        print(json.dumps(r), flush=True)
        results.append(r)
    print(json.dumps({'summary': results,
                      'train_lines': len(tr), 'val_lines': len(va)}))


if __name__ == '__main__':
    main()
