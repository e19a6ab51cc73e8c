"""
ketos convert subcommand (reference: kraken/ketos/weights.py): converts
training checkpoints into plain weights files.
"""
import logging

import click

logger = logging.getLogger('kraken')


@click.command('convert')
@click.pass_context
@click.option('-o', '--output', type=click.Path(), default='model.safetensors')
@click.option('--weights-format', '--format', 'fmt', default='safetensors',
              type=click.Choice(['safetensors', 'coreml']),
              help='Output weights format.')
@click.argument('checkpoints', nargs=-1, type=click.Path(exists=True, dir_okay=False))
def convert(ctx, output, fmt, checkpoints):
    """
    Converts and combines one or more checkpoints/weights files into a
    deployable multi-model weights file (reference: ketos/weights.py:48).
    """
    from kraken_tpu.models import load_models, write_models
    from kraken_tpu.ketos import message

    if not checkpoints:
        raise click.UsageError('Checkpoint conversion requires at least one input checkpoint.')
    models = []
    for ckpt in checkpoints:
        models.extend(load_models(ckpt))
    write_models(models, output, format=fmt)
    message(f'Output file written to {output}')
