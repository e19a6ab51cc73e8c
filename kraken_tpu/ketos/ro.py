"""
ketos rotrain/roadd subcommands (reference: kraken/ketos/ro.py).
"""
import logging
from pathlib import Path

import click

from kraken_tpu.ketos.util import _load_yaml_config, expand_manifests

logger = logging.getLogger('kraken')


@click.command('rotrain')
@click.pass_context
@click.option('--config', callback=_load_yaml_config, is_eager=True,
              expose_value=False, type=click.Path(exists=True))
@click.option('-o', '--output', type=click.Path(), default='model')
@click.option('-B', '--batch-size', type=int, default=6000)
@click.option('-F', '--freq', default=1.0, type=float)
@click.option('-q', '--quit', default='fixed', type=click.Choice(['early', 'fixed']))
@click.option('-N', '--epochs', default=-1, type=int)
@click.option('--lag', default=10, type=int)
@click.option('-r', '--lrate', default=1e-3, type=float)
@click.option('-p', '--partition', default=0.9, type=float)
@click.option('-t', '--training-data', '--training-files', 'training_files', multiple=True, callback=expand_manifests,
              type=click.Path(exists=True))
@click.option('-e', '--evaluation-data', '--evaluation-files', 'evaluation_files', multiple=True, callback=expand_manifests,
              type=click.Path(exists=True))
@click.option('-f', '--format-type', default='xml',
              type=click.Choice(['xml', 'alto', 'page']))
@click.option('--level', default='baselines', type=click.Choice(['baselines', 'regions']),
              help='Compute reading order on line or region level.')
@click.option('--reading-order', default=None,
              help='Name of the reading order to train on.')
@click.option('--devices', type=int, default=1,
              help='Number of devices for data-parallel training.')
@click.argument('ground_truth', nargs=-1, type=click.Path(exists=True, dir_okay=False))
def rotrain(ctx, output, batch_size, freq, quit, epochs, lag, lrate, partition,
            training_files, evaluation_files, format_type, level, reading_order,
            devices, ground_truth):
    """
    Trains a reading order determination model.
    """
    from kraken_tpu.configs import ReadingOrderTrainingConfig, TrainingDataConfig
    from kraken_tpu.dataset.utils import _get_type
    from kraken_tpu.train import KrakenTrainer, RODataModule, ROModel, save_checkpoint
    from kraken_tpu.xml import XMLPage
    from kraken_tpu.ketos import message

    training_data = list(ground_truth) + list(training_files or [])
    if not training_data:
        raise click.UsageError('No training data provided.')
    config = ReadingOrderTrainingConfig(checkpoint_path=output, freq=freq,
                                        quit=quit, epochs=epochs, lag=lag,
                                        lrate=lrate, level=level,
                                        reading_order=reading_order,
                                        device=ctx.meta['device'],
                                        precision=ctx.meta['precision'])
    # build class mapping from the observed tags
    class_mapping = {'default': 0}
    for f in training_data:
        try:
            doc = XMLPage(f, filetype=format_type)
            elements = (doc.lines.values() if level == 'baselines'
                        else [r for regs in doc.regions.values() for r in regs])
            for el in elements:
                tag = _get_type(el.tags)
                if tag not in class_mapping:
                    class_mapping[tag] = len(class_mapping)
        except ValueError as e:
            logger.warning(f'Invalid file {f}: {e}')
    data_config = TrainingDataConfig(training_data=training_data,
                                     evaluation_data=list(evaluation_files) or None,
                                     partition=partition,
                                     batch_size=batch_size,
                                     num_workers=ctx.meta['workers'])
    data_config.format_type = format_type
    data_config.reading_order = reading_order
    dm = RODataModule(data_config, class_mapping=class_mapping, level=level)
    module = ROModel(config, level=level)
    from kraken_tpu.ketos.util import build_device_mesh
    trainer = KrakenTrainer(config, mesh=build_device_mesh(devices))
    trainer.fit(module, dm)
    message(f'Training complete. Best epoch: {trainer.best_epoch} '
            f'(metric {trainer.best_metric:.4f})')


@click.command('roadd')
@click.pass_context
@click.option('-o', '--output', type=click.Path(), default='combined.safetensors',
              help='Output file for the combined model.')
@click.option('-r', '--ro-model', type=click.Path(exists=True), required=True,
              help='Reading order model (checkpoint or weights).')
@click.option('-i', '--seg-model', type=click.Path(exists=True), required=True,
              help='Segmentation model to combine with.')
def roadd(ctx, output, ro_model, seg_model):
    """
    Combines a reading order model with a segmentation model into one file.
    """
    from kraken_tpu.models import load_models, write_models
    from kraken_tpu.ketos import message

    models = load_models(seg_model)
    ro_models = [m for m in load_models(ro_model)
                 if 'reading_order' in getattr(m, 'model_type', [])]
    if not ro_models:
        raise click.UsageError(f'No reading order model found in {ro_model}')
    write_models(models + ro_models, output)
    message(f'Combined model written to {output}')
