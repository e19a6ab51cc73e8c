#!/usr/bin/env python
"""
Segmentation/reading-order training-convergence sanity checks: overfits tiny
nets on the single annotated test page. Segmentation mean-IU and baseline-
detection precision climb monotonically; the RO model reaches Spearman
> 0.99. (~5 min on one CPU core.)

Usage: JAX_PLATFORM_NAME=cpu python scripts/overfit_seg_check.py
"""
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

XML = str(pathlib.Path(__file__).parent.parent /
          'tests/resources/170025120000003,0074.xml')


def seg_check(epochs: int = 200):
    from kraken_tpu.configs import (SegmentationTrainingConfig,
                                    SegmentationTrainingDataConfig)
    from kraken_tpu.train import (KrakenTrainer, SegmentationDataModule,
                                  SegmentationModel)
    tmp = pathlib.Path(tempfile.mkdtemp())
    config = SegmentationTrainingConfig(
        spec='[1,384,0,3 Cr3,3,16,2,2 Gn8 Cr3,3,32,2,2 Gn8 Cr3,3,32 Gn8]',
        epochs=epochs, lrate=1e-3, freq=50, checkpoint_path=str(tmp / 's'))
    dc = SegmentationTrainingDataConfig(training_data=[XML],
                                        evaluation_data=[XML], batch_size=1)
    module = SegmentationModel(config)
    KrakenTrainer(config).fit(module, SegmentationDataModule(dc))
    history = module.net.user_metadata['metrics']
    for epoch, metrics in history:
        print('seg', epoch, {k: round(float(v), 4) for k, v in metrics.items()
                             if isinstance(v, (int, float))})
    ius = [m['val_mean_iu'] for _, m in history]
    assert ius[-1] > ius[0], 'mean IU did not improve'
    assert history[-1][1]['val_bl_precision'] > 0.5, 'baseline detection did not emerge'


def ro_check(epochs: int = 200):
    from kraken_tpu.configs import ReadingOrderTrainingConfig, TrainingDataConfig
    from kraken_tpu.train import KrakenTrainer, RODataModule, ROModel
    tmp = pathlib.Path(tempfile.mkdtemp())
    config = ReadingOrderTrainingConfig(epochs=epochs, lrate=1e-3, freq=50,
                                        checkpoint_path=str(tmp / 'ro'))
    dc = TrainingDataConfig(training_data=[XML], evaluation_data=[XML],
                            batch_size=256)
    dm = RODataModule(dc, class_mapping={'default': 0, '$pag': 0, '$tip': 0,
                                         '$par': 0, '$pac': 0})
    module = ROModel(config)
    KrakenTrainer(config).fit(module, dm)
    history = module.net.user_metadata.get('metrics', [])
    for epoch, metrics in history:
        print('ro', epoch, {k: round(float(v), 4) for k, v in metrics.items()
                            if isinstance(v, (int, float))})
    assert history[-1][1]['val_spearman'] > 0.99, 'RO model did not converge'


if __name__ == '__main__':
    seg_check()
    ro_check()
    print('CONVERGED: segmentation learns, RO reaches Spearman > 0.99')
