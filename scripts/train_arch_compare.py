"""
Architecture quality evidence (VERDICT r2 item 3): trains the reference
architecture ('default'), the MXU-width 'tpu' preset, and the
space-to-depth-prefix variant to convergence on the fixture corpus
(merge_tests ground truth + the annotated page lines) and reports CER
side-by-side. All three must reach the same (≈0) CER for the fast
presets' speed numbers to count as equal-quality; epochs-to-target is the
learnability signal. Results recorded in docs/architecture.md.

Usage: python scripts/train_arch_compare.py [--epochs N]
"""
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

RES = pathlib.Path(__file__).parent.parent / 'tests/resources'

SPECS = {
    'default': 'default',   # reference CNN+3xBiLSTM-200
    'tpu': 'tpu',           # MXU-width 128-channel strided convs
    's2d-prefix': ('[1,120,0,1 S1(30x4)1,3 Cr3,13,32 Do0.1,2 Mp2,2 '
                   'Cr3,13,32 Do0.1,2 Mp2,2 Cr3,9,64 Do0.1,2 Mp2,2 '
                   'Cr3,9,64 Do0.1,2 S1(1x0)1,3 Lbx200 Do0.1,2 Lbx200 '
                   'Do0.1,2 Lbx200 Do]'),
    'tpu-attn': 'tpu-attn',  # rotary-attention encoder blocks (Te)
}


_ARROW = None


def _corpus_arrow():
    """Compiles the fixture lines into an arrow once (lines pre-extracted;
    'path' format re-extracts every epoch, dominating wall time)."""
    global _ARROW
    if _ARROW is None:
        from kraken_tpu.dataset.arrow import build_binary_dataset
        out = pathlib.Path(tempfile.mkdtemp()) / 'corpus.arrow'
        build_binary_dataset(
            files=[str(RES / 'merge_tests' / f'{n}.jpg')
                   for n in ('0006', '0007', '0008', '0021')],
            output_file=str(out), format_type='path')
        _ARROW = str(out)
    return _ARROW


def train_one(name: str, spec: str, epochs: int):
    from kraken_tpu.configs import (RecognitionTrainingConfig,
                                    RecognitionTrainingDataConfig)
    from kraken_tpu.train import (KrakenTrainer, RecognitionDataModule,
                                  RecognitionModel)

    tmp = pathlib.Path(tempfile.mkdtemp())
    config = RecognitionTrainingConfig(
        spec=spec, epochs=epochs, quit='fixed', lrate=3e-3, warmup=20,
        freq=100, batch_size=4, checkpoint_path=str(tmp / name))
    dc = RecognitionTrainingDataConfig(
        format_type='binary',
        training_data=[_corpus_arrow()],
        evaluation_data=[_corpus_arrow()],
        batch_size=4)
    module = RecognitionModel(config)
    t0 = time.perf_counter()
    KrakenTrainer(config).fit(module, RecognitionDataModule(dc))
    wall = time.perf_counter() - t0
    history = module.net.user_metadata['metrics']
    best_cer = min(1 - m.get('val_accuracy', 0.0) for _, m in history)
    first_zero = next((ep for ep, m in history
                       if m.get('val_accuracy', 0.0) >= 0.9999), None)
    return {'arch': name,
            'best_cer': round(best_cer, 4),
            'epochs_to_100pct': first_zero,
            'wall_s': round(wall, 1),
            'history_tail': [(ep, round(m.get('val_accuracy', 0.0), 4))
                             for ep, m in history[-3:]]}


def main():
    epochs = 1000
    if '--epochs' in sys.argv:
        epochs = int(sys.argv[sys.argv.index('--epochs') + 1])
    specs = SPECS
    if '--only' in sys.argv:
        pick = sys.argv[sys.argv.index('--only') + 1]
        specs = {pick: SPECS[pick]}
    results = []
    for name, spec in specs.items():
        print(f'=== training {name} ({epochs} epochs) ===', flush=True)
        r = train_one(name, spec, epochs)
        print(json.dumps(r), flush=True)
        results.append(r)
    print(json.dumps({'summary': results}))


if __name__ == '__main__':
    main()
