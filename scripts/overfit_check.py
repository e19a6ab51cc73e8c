#!/usr/bin/env python
"""
Training-convergence sanity check: overfits a small CNN+BiLSTM on the two
lines of tests/resources/merge_tests/base.arrow. Reaches 100 % character and
word accuracy in ~300 epochs (~3 min on one CPU core), demonstrating the
full optax/CTC/codec/decode stack end to end.

Usage: JAX_PLATFORM_NAME=cpu python scripts/overfit_check.py
"""
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from kraken_tpu.configs import (RecognitionTrainingConfig,
                                RecognitionTrainingDataConfig)
from kraken_tpu.train import (KrakenTrainer, RecognitionDataModule,
                              RecognitionModel)

ARROW = pathlib.Path(__file__).parent.parent / 'tests/resources/merge_tests/base.arrow'


def main(epochs: int = 500):
    tmp = pathlib.Path(tempfile.mkdtemp())
    config = RecognitionTrainingConfig(
        spec='[1,48,0,1 Cr3,13,16 Do0.1,2 Mp2,2 Cr3,9,16 Do0.1,2 Mp2,2 '
             'S1(1x0)1,3 Lbx64 Do0.1,2]',
        epochs=epochs, lrate=3e-3, warmup=20, freq=100,
        checkpoint_path=str(tmp / 'm'))
    dc = RecognitionTrainingDataConfig(
        format_type='binary',
        training_data=[str(ARROW)], evaluation_data=[str(ARROW)],
        batch_size=2)
    module = RecognitionModel(config)
    KrakenTrainer(config).fit(module, RecognitionDataModule(dc))
    for epoch, metrics in module.net.user_metadata['metrics']:
        print(epoch, {k: round(v, 4) for k, v in metrics.items()
                      if isinstance(v, float)})
    final = module.net.user_metadata['metrics'][-1][1]
    assert final['val_accuracy'] == 1.0, 'training failed to converge'
    print('CONVERGED: 100% character accuracy')


if __name__ == '__main__':
    main()
